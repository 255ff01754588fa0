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


def test_pinned_model_matches_fresh_fit(spark):
    """The gate model (plans/_pinned_pca.py, via tools/pin_pca.py) must
    track the live fit — drift in fit_pca's algorithm or the gate dataset
    fails here before it silently breaks the driver hash gate."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_pca import (
        _PCA_COMPONENTS,
        _PCA_MEAN,
    )
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    fresh = fit_pca(emb, "embedding", k=len(_PCA_COMPONENTS))
    np.testing.assert_allclose(fresh.mean, np.array(_PCA_MEAN), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        fresh.components, np.array(_PCA_COMPONENTS).T, rtol=1e-7, atol=1e-9
    )


def test_gate_expression_path_matches_blas_transform(spark):
    """embedding_pca_projection's unrolled-expression coordinates agree with
    transform_pca's BLAS route (different summation order → 1e-9, not
    bit-equal; bit-equality is only promised cross-ENGINE on the unrolled
    form, which the oracle hash asserts)."""
    from data_lake_medallion_architecture_project_spark.plans import REGISTRY
    from data_lake_medallion_architecture_project_spark.plans._pinned_pca import (
        _PCA_COMPONENTS,
        _PCA_MEAN,
    )
    from data_lake_medallion_architecture_project_spark.operators.pca import PcaModel
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.01"
    got = {
        r["vec_id"]: [r["pc1"], r["pc2"], r["pc3"], r["pc4"]]
        for r in REGISTRY["embedding_pca_projection"].build(spark, sf).collect()
    }
    model = PcaModel(
        mean=np.array(_PCA_MEAN),
        components=np.array(_PCA_COMPONENTS).T,
        explained_variance=np.zeros(len(_PCA_COMPONENTS)),
        total_variance=1.0,
    )
    emb = load_table(spark, sf, "embeddings")
    blas = {
        r["vec_id"]: r["projection"]
        for r in transform_pca(emb, "embedding", model)
        .select("vec_id", "projection")
        .collect()
    }
    assert set(got) == set(blas)
    g = np.array([got[k] for k in sorted(got)])
    b = np.array([blas[k] for k in sorted(blas)])
    np.testing.assert_allclose(g, b, rtol=1e-9, atol=1e-12)
