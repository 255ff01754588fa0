"""Guaranteed-recall frequent-items (heavy hitters) without a full shuffle.

The standard corpus profiling question — "which n-grams occur more often than
N/k?" — answered exactly, but with shuffle volume proportional to the ANSWER,
not the vocabulary. A plain ``GROUP BY token`` shuffles one row per distinct
token per partition (at 100 TB: billions of rows, almost all of which are
rare tokens nobody asked about). This operator instead:

1. **Candidate generation, zero shuffle.** Each partition counts its own
   tokens in memory (``mapInPandas`` with per-partition state) and emits
   only tokens whose LOCAL count exceeds local_rows/k, plus one row carrying
   the partition's total. The pigeonhole guarantee: if a token's global
   count C > N/k, then some partition has local count c_p > N_p/k —
   otherwise summing c_p ≤ N_p/k over partitions bounds C ≤ N/k. So the
   candidate set has NO false negatives; false positives are culled next.
2. **Exact recount, candidate-sized shuffle.** The candidate set (at most
   k·n_partitions rows) broadcasts back; the corpus re-aggregates only
   matching tokens map-side and the final filter applies the exact global
   threshold. Output counts are exact integers — which is why the DuckDB
   oracle can hash-match this operator even though phase 1 is a sketch-style
   bounded-memory pass.

This is the two-phase shape of Misra-Gries/SpaceSaving deployments, with the
simpler local-threshold summary (local exact counts are free here: a corpus
partition's distinct-token set fits executor memory by Heaps' law; swap in
true Misra-Gries eviction inside ``_candidates_iter`` if it ever didn't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_items"]

_CAND_SCHEMA = "item string, n long"


def _candidate_batches(batches, col: str, k: int):
    """Per-partition pass: exact local counts, emit local heavy hitters and
    one (item=NULL, n=partition_rows) total row."""
    import pandas as pd

    counts: dict = {}
    total = 0
    for pdf in batches:
        total += len(pdf)
        for item, c in pdf[col].value_counts().items():
            counts[item] = counts.get(item, 0) + int(c)
    items = [it for it, c in counts.items() if c * k > total]
    yield pd.DataFrame(
        {"item": items + [None], "n": [counts[it] for it in items] + [total]}
    )


def frequent_items(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Items of ``tokens[col]`` whose exact global count C satisfies
    C·k > N (i.e. frequency > 1/k), as (item, n) with exact counts."""
    summary = tokens.select(F.col(col).alias("item")).mapInPandas(
        lambda it: _candidate_batches(it, "item", k), schema=_CAND_SCHEMA
    )
    summary = summary.localCheckpoint(eager=True)  # one pass feeds both reads
    n_total = summary.filter(F.col("item").isNull()).agg(F.sum("n")).collect()[0][0]
    candidates = summary.filter(F.col("item").isNotNull()).select("item").distinct()
    return (
        tokens.select(F.col(col).alias("item"))
        .join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > F.lit(n_total))
    )
