"""Distributed spherical k-means — Lloyd's iterations as DataFrame aggs.

``train_ivf_centroids`` (operators/similarity.py) trains on a bounded
driver-side sample — the right cost for IVF bucketing, but it caps the
training set at driver memory. This is the full-corpus trainer: every
iteration is

1. **assign** — broadcast the k×d centroid matrix into an Arrow-batched
   pandas UDF (one BLAS argmax per batch, the same kernel as
   ``_assign_udf``); map-only over the corpus.
2. **re-estimate** — ``posexplode`` each vector to (centroid, dim, value)
   and ``groupBy(centroid, dim).sum()``. The explode is a d× row expansion
   of narrow rows, but partial (map-side) aggregation collapses every
   partition to at most k·d rows BEFORE the exchange — the shuffle carries
   O(k·d·partitions), never O(n·d). The k·d sums + k counts collect to the
   driver (kilobytes) to form the next centroid matrix.

So per iteration the corpus is read once (cached), the shuffle is
model-sized, and the model round-trips through a broadcast — the textbook
scalable-k-means shape (MLlib's KMeans does the same dance over RDDs; this
is the DataFrame-native form with Arrow batches).

Determinism: init centroids come from the same hash-ordered deterministic
sample as the IVF trainer, and every iteration's sums are over a fixed
partition layout — re-running in one session reproduces the run. Spherical
variant: vectors and centroids are L2-normalized, so argmax-dot is cosine
assignment, matching the IVF probe contract.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .similarity import _assign_udf, to_double_array


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms == 0, 1.0, norms)


def distributed_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Full-corpus spherical k-means; returns the k×d centroid matrix
    (L2-normalized rows), drop-in compatible with ``_assign_udf`` /
    ``write_ivf_bucketed``'s probe math."""
    vecs = df.select(to_double_array(vec_col).alias("v")).cache()
    try:
        init_rows = (
            df.select(F.col(id_col).alias("i"), to_double_array(vec_col).alias("v"))
            .orderBy(F.xxhash64(F.col("i"), F.lit(seed)), F.col("i"))
            .limit(k)
            .collect()
        )
        cent = _normalize_rows(
            np.array([r["v"] for r in init_rows], dtype=np.float64)
        )
        d = cent.shape[1]
        for _ in range(iters):
            assign = _assign_udf(cent)
            assigned = vecs.withColumn("c", assign(F.col("v")))
            # (c, dim, val) rows; partial agg collapses to ≤ k·d per task.
            sums = (
                assigned.select("c", F.posexplode("v").alias("dim", "val"))
                .groupBy("c", "dim")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new = np.zeros((k, d), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for r in sums:
                new[r["c"], r["dim"]] = r["s"]
                counts[r["c"]] = r["n"]
            # Empty clusters keep their previous centroid (standard Lloyd's
            # fallback; a hash-sampled init over a non-degenerate corpus
            # rarely produces one).
            nonempty = counts > 0
            new[nonempty] = new[nonempty] / counts[nonempty, None]
            new[~nonempty] = cent[~nonempty]
            cent = _normalize_rows(new)
        return cent
    finally:
        vecs.unpersist()


def kmeans_inertia(
    df: DataFrame,
    cent: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Mean spherical inertia (1 − cosine to the assigned centroid) — the
    objective Lloyd's minimizes in the spherical setting. One map-only pass;
    used by tests to assert monotone convergence."""
    c = cent

    @F.pandas_udf(DoubleType())
    def best_cos(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            x = np.array(s.tolist(), dtype=np.float64)
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.where(norms == 0, 1.0, norms)
            yield pd.Series((x @ c.T).max(axis=1))

    row = (
        df.select(to_double_array(vec_col).alias("v"))
        .select(F.avg(best_cos(F.col("v"))).alias("m"))
        .collect()[0]
    )
    return 1.0 - float(row["m"])
