"""Tests for operators/pca.py — numpy parity, invariants, determinism."""

from __future__ import annotations

import numpy as np

from data_lake_medallion_architecture_project_spark.operators.pca import fit_pca, transform_pca

from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals, evecs = evals[order], evecs[:, order]
    for j in range(evecs.shape[1]):
        i = np.argmax(np.abs(evecs[:, j]))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return mean, evecs, evals


def test_fit_matches_numpy(spark):
    df = _emb(spark).repartition(8)
    x = np.array([r["embedding"] for r in df.collect()], dtype=np.float64)
    model = fit_pca(df, "embedding", k=8)
    mean, comps, evals = _numpy_pca(x, 8)
    np.testing.assert_allclose(model.mean, mean, rtol=1e-10)
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-8)
    np.testing.assert_allclose(model.components, comps, rtol=1e-6, atol=1e-8)


def test_components_orthonormal_variance_descending(spark):
    model = fit_pca(_emb(spark), "embedding", k=8)
    gram = model.components.T @ model.components
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-10)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert 0 < model.explained_variance_ratio.sum() <= 1 + 1e-12


def test_partition_count_does_not_change_model(spark):
    df = _emb(spark)
    m1 = fit_pca(df.repartition(2), "embedding", k=4)
    m16 = fit_pca(df.repartition(16), "embedding", k=4)
    np.testing.assert_allclose(m1.components, m16.components, rtol=1e-9, atol=1e-11)


def test_transform_projects_and_reconstruction_improves_with_k(spark):
    df = _emb(spark)
    x = np.array([r["embedding"] for r in df.collect()], dtype=np.float64)

    def recon_err(k):
        m = fit_pca(df, "embedding", k=k)
        rows = transform_pca(df, "embedding", m).select("vec_id", "projection").collect()
        p = np.array([r["projection"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        xs = np.array(
            [
                r["embedding"]
                for r in sorted(df.collect(), key=lambda r: r["vec_id"])
            ],
            dtype=np.float64,
        )
        rec = p @ m.components.T + m.mean
        return float(((xs - rec) ** 2).sum())

    e4, e16, e64 = recon_err(4), recon_err(16), recon_err(64)
    assert e4 > e16 > e64
    assert e64 < 1e-15  # k = d reconstructs exactly

    m8 = fit_pca(df, "embedding", k=8)
    got = transform_pca(df, "embedding", m8).select("projection").first()[0]
    assert len(got) == 8
