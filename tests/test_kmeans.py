"""Distributed spherical k-means (operators/kmeans): recovery of separated
clusters, monotone convergence, and compatibility with the IVF probe math."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.kmeans import (
    distributed_kmeans,
    kmeans_inertia,
)


def _blob_df(spark, seed=7, n_per=60, d=8):
    """Three well-separated unit-norm blobs around orthogonal anchors."""
    rng = np.random.default_rng(seed)
    anchors = np.eye(d)[:3]
    rows = []
    i = 0
    for a_idx, a in enumerate(anchors):
        pts = a + 0.05 * rng.standard_normal((n_per, d))
        for p in pts:
            rows.append((i, a_idx, [float(x) for x in p]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<double>"
    )


def test_recovers_separated_blobs(spark):
    df = _blob_df(spark)
    cent = distributed_kmeans(df, k=3, iters=8)
    assert cent.shape == (3, 8)
    # Assignment purity: every blob maps to exactly one centroid.
    from data_lake_medallion_architecture_project_spark.operators.similarity import _assign_udf
    from pyspark.sql import functions as F

    assigned = df.withColumn("c", _assign_udf(cent)(F.col("embedding")))
    purity = (
        assigned.groupBy("blob")
        .agg(F.countDistinct("c").alias("nc"))
        .collect()
    )
    assert all(r["nc"] == 1 for r in purity)
    blobs_to_c = {
        r["blob"]: r["c"]
        for r in assigned.select("blob", "c").distinct().collect()
    }
    assert len(set(blobs_to_c.values())) == 3  # and the mapping is 1:1


def test_inertia_monotone_nonincreasing(spark):
    df = _blob_df(spark, seed=11)
    prev = None
    for iters in (1, 3, 6):
        cent = distributed_kmeans(df, k=3, iters=iters)
        inertia = kmeans_inertia(df, cent)
        if prev is not None:
            assert inertia <= prev + 1e-9, (iters, inertia, prev)
        prev = inertia
    assert prev < 0.01  # tight blobs → near-zero spherical inertia


def test_same_session_determinism(spark):
    df = _blob_df(spark, seed=13)
    c1 = distributed_kmeans(df, k=3, iters=4)
    c2 = distributed_kmeans(df, k=3, iters=4)
    assert np.allclose(c1, c2)


def test_compatible_with_ivf_probe_contract(spark):
    """Centroids from the distributed trainer slot into the same argmax-dot
    probe math the IVF operators use (unit rows, k×d)."""
    df = _blob_df(spark, seed=17)
    cent = distributed_kmeans(df, k=3, iters=4)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


def test_more_clusters_than_points_rejected_or_padded(spark):
    """k larger than the corpus: init sample simply has fewer rows — the
    operator should fail loudly, not mis-shape the model."""
    small = _blob_df(spark, n_per=1)  # 3 points
    with pytest.raises(Exception):
        distributed_kmeans(small, k=8, iters=1)


def test_pinned_centroids_match_fresh_fit(spark):
    """plans/_pinned_centroids.py is a generated export of the seeded fit on
    the gate-scale embeddings — drift in the fit algorithm (or a regenerated
    gate dataset) must fail here, prompting a tools/pin_centroids.py rerun."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    fresh = distributed_kmeans(emb, k=8, iters=4)
    pinned = np.array(_CLUSTER_CENTROIDS_K8, dtype=np.float64)
    assert pinned.shape == fresh.shape
    # Partition-layout float-sum reordering allows tiny per-dim wiggle; an
    # algorithm change moves centroids by orders of magnitude more.
    assert np.allclose(pinned, fresh, atol=1e-8)
