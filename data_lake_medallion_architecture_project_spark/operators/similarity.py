"""Similarity search over embedding columns.

``brute_force_topk`` is the exact baseline: broadcast the (small) query set
against the candidate corpus, compute cosine via JVM-side array folds, rank
with a per-query window. Cost is O(|queries| · |corpus| · dim) map-side work
with no shuffle of the corpus — at 100 TB the corpus scan dominates and
parallelizes linearly; the only shuffle is the per-query top-k (tiny, keyed on
query id, bounded by the window).

The scale path beyond brute force (IVF / LSH bucketing) trades recall for a
bucketed join; see operators/dedup.py for the banded-LSH machinery it reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, l2_norm, to_double_array


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (qid, cid, rank) per query vector.

    Rank ties broken by candidate id → deterministic output. The cosine score
    itself is intentionally not emitted: rank is the contract.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            to_double_array(vec_col).alias("qvec"),
        ).withColumn("qnorm", l2_norm(F.col("qvec")))
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        to_double_array(vec_col).alias("cvec"),
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            cosine(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.select("qid", "cid", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )
