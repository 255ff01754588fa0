"""Physical-plan audit over the whole query registry.

For every registered query, prints the plan facts that matter at 100 TB:
which join strategies Catalyst picked, which filters reached the parquet
scans, how many columns each scan reads, and whether any scan reads the
whole schema (pruning failure). Red flags are listed at the end:

* CartesianProduct / BroadcastNestedLoopJoin — an accidental cross join
  (the bucketed range join in operators/rangejoin.py exists to avoid these);
* scans with no pushed filters on queries that filter;
* scans reading >8 columns (pruning not reaching the reader);
* row-at-a-time BatchEvalPython anywhere in a plan — the banned slow path
  (Arrow stages — MapInArrow / ArrowEvalPython / FlatMapGroupsInPandas —
  are the sanctioned Python boundary and are not flagged).

Usage: python tools/explain_all.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY  # noqa: E402
from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)"
)

# Queries whose nested-loop plan is the documented intent: exact brute-force
# baselines whose bucketed/LSH scale path exists as a separate operator.
NESTED_LOOP_OK = {
    "similarity_topk",  # exact baseline; scale path = ivf_similarity_topk
    # Composes brute_force_topk (the exact baseline above) for a 32-query
    # leave-one-out eval; the scale path swaps in ivf_topk unchanged because
    # both emit the same (qid, cid, rank) shape.
    "knn_label_accuracy",
    "embedding_near_dup_pairs",  # exact O(n²) pairs; scale path = MinHash-LSH
    # Scalar broadcast: BNLJ whose build side is a broadcast 1-ROW aggregate
    # (global min/span cross-joined back). O(n)·O(1) — the optimal plan for
    # attaching global bounds; Catalyst constant-folds away any dummy
    # equi-key, so a hash join is not reachable for this shape.
    "order_price_histogram",
    # Q11-shape HAVING > scalar: the 1-row global threshold broadcast joins
    # the 25-row nation aggregate on an inequality — no equi-key exists, and
    # both sides are already post-aggregation small. (The Q15 twin becomes a
    # BroadcastHashJoin because its predicate is an equality.)
    "major_supply_nations",
    # Scalar broadcast again: |V| (vocabulary size) is a 1-row aggregate
    # cross-joined into the smoothing denominator — O(n)·O(1), keeps the
    # model computation one lazy DAG instead of a driver-side count.
    "doc_lm_perplexity",
    # Same |V|/N 1-row scalar broadcast; the model itself is the K-row
    # broadcast hash join, not this.
    "doc_lm_perplexity_capped",
    # Pairwise `a.g < b.g` over the per-GROUP theta summary (5 rows at any
    # data scale: one row per priority enum value) — O(G²) in the bounded
    # group count, never in data rows; the inequality has no equi-key.
    "kmv_priority_customer_overlap",
    # The compressed-domain ADC scan: 8 broadcast query TABLES against the
    # 8-byte-code corpus — deliberately exhaustive (memory-bound lookups,
    # the point of PQ); the IVF partition pruning composes in front when
    # the scan itself must shrink (standard IVF-PQ).
    "pq_similarity_topk",
    # Scalar broadcast: the 1-row basket total (n_orders) cross-joined onto
    # the 25-row winner set — the whitelisted O(n)·O(1) shape.
    "part_association_rules",
    # Scalar broadcast (round 10): the 1-row (n_docs, avgdl) corpus-stats
    # aggregate cross-joined onto the match-sized scored relation — replaced
    # the former driver collect (which cost a separate tokenize job).
    "bm25_search_docs",
    # Scalar broadcast (round 12): the 1-row (d_total, w_total) corpus
    # totals cross-joined onto the sources-sized (≤ |sources|-row) count
    # table to derive temperature quotas — O(sources)·O(1); the document
    # scan itself probes the alloc table through a BroadcastHASHJoin on
    # the source equi-key.
    "temperature_mix_allocation",
    "temperature_mix_sample",
}
PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
SCHEMA_RE = re.compile(r"ReadSchema: struct<([^>]*)>")


def audit(spark, sf_dir: str, verbose: bool = True) -> list[str]:
    """Explain every registry query and return the red-flag list (empty =
    clean). Shared by the CLI below and tests/test_plan_shapes.py, so a
    plan regression (accidental cross join, lost column pruning, a
    row-at-a-time Python stage) fails CI instead of waiting for a human to
    re-run the tool."""
    flags: list[str] = []
    for name, q in sorted(REGISTRY.items()):
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                q.build(spark, sf_dir).explain("formatted")
        except Exception as ex:  # pragma: no cover - audit tool
            if verbose:
                print(f"{name:34s} EXPLAIN FAILED: {ex}")
            flags.append(f"{name}: explain failed")
            continue
        plan = buf.getvalue()
        joins = JOIN_RE.findall(plan)
        scan_widths = [len(s.split(",")) for s in SCHEMA_RE.findall(plan)]
        pushed = [p for p in PUSHED_RE.findall(plan) if p.strip()]
        arrow_stages = len(
            re.findall(r"MapInArrow|ArrowEvalPython|FlatMapGroupsInPandas", plan)
        )
        if verbose:
            print(
                f"{name:34s} joins={','.join(joins) or '-':40s} "
                f"scan_cols={scan_widths} pushed={len(pushed)} arrow={arrow_stages}"
            )
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if bad in joins and name not in NESTED_LOOP_OK:
                flags.append(f"{name}: {bad}")
        if any(w > 8 for w in scan_widths):
            flags.append(f"{name}: scan reads {max(scan_widths)} columns")
        if "BatchEvalPython" in plan:
            flags.append(f"{name}: row-at-a-time BatchEvalPython in plan")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain_all")
    spark.sparkContext.setLogLevel("ERROR")
    flags = audit(spark, sf_dir)
    print()
    if flags:
        print("RED FLAGS:")
        for f in flags:
            print(" -", f)
        sys.exit(1)
    print("no red flags")


if __name__ == "__main__":
    main()
