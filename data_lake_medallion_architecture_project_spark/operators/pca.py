"""Distributed PCA over an embedding column — compression for vector stores.

The standard embedding-pipeline step between "compute embeddings" and "serve
them": project d-dim vectors onto the top-k principal directions (often
followed by whitening + int8 quantization, see ``plans/compression.py``).
Structured like the other model-fitting operators here (k-means, BPE): the
data-sized work is distributed and statistics-shaped, the model-sized work
happens once on the driver.

* **Fit = one pass, model-sized traffic.** Each partition folds its vectors
  into (count, Σx, ΣxxT) with BLAS (``mapInArrow``) and emits ONE row of
  d + d² floats. The driver sums the partials — associative/commutative
  exact-float adds of per-partition matrices — forms the covariance
  C = ΣxxT/n − μμT, and eigendecomposes d×d with numpy. For any real
  embedding width (d ≤ a few thousand) the d² partial is KBs-to-MBs per
  partition; the corpus itself never moves.
* **Transform = Arrow-batched matmul.** Projection is (X − μ) @ W with the
  (d, k) component matrix broadcast; runs as a vectorized pandas UDF over
  Arrow batches — one BLAS call per batch, no per-row Python.
* **Determinism.** eigh eigenvalues are sorted descending; each component's
  sign is fixed by making its largest-magnitude coordinate positive (eigen
  vectors are defined up to sign — without the convention two runs could
  emit mirrored projections).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PcaModel", "fit_pca", "transform_pca"]


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (d, k) — columns are principal directions
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    total_variance: float  # trace of the covariance

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        return self.explained_variance / self.total_variance


def _moment_batches(batches, col: str, d: int):
    """Per-partition fold: one (n, Σx, vec(ΣxxT)) row."""
    import pyarrow as pa

    n = 0
    s = np.zeros(d, dtype=np.float64)
    m = np.zeros((d, d), dtype=np.float64)
    for batch in batches:
        arr = batch.column(col)
        if len(arr):
            # Vectorized Arrow→numpy: flatten the list column's value buffer
            # and reshape — no per-row Python materialization.
            x = arr.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(len(arr), d)
            n += x.shape[0]
            s += x.sum(axis=0)
            m += x.T @ x
    yield pa.RecordBatch.from_pydict(
        {
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "m": pa.array([m.ravel().tolist()], pa.list_(pa.float64())),
        }
    )


def fit_pca(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """Fit PCA on ``df[vec_col]`` (array<float>), keep top-k components."""
    d = len(df.select(vec_col).first()[0])
    partials = df.select(F.col(vec_col).alias("v")).mapInArrow(
        lambda it: _moment_batches(it, "v", d),
        schema="n long, s array<double>, m array<double>",
    )
    rows = partials.collect()  # one row per partition — model-sized
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("fit_pca: empty input")
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    m = np.sum([np.array(r["m"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = m / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    evals, evecs = evals[order], evecs[:, order]
    # Sign convention: largest-|coordinate| entry of each component positive.
    for j in range(evecs.shape[1]):
        i = np.argmax(np.abs(evecs[:, j]))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return PcaModel(
        mean=mean,
        components=evecs,
        explained_variance=np.maximum(evals, 0.0),
        total_variance=float(np.trace(cov)),
    )


def transform_pca(df: DataFrame, vec_col: str, model: PcaModel) -> DataFrame:
    """Append ``projection`` (array<double>, length k): (x − μ) @ W."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((model.mean, model.components))

    def _project(vecs):
        mean, comps = bc.value
        x = np.asarray(vecs.tolist(), dtype=np.float64)
        out = (x - mean) @ comps
        return pd.Series(list(out))

    project_udf = F.pandas_udf(_project, ArrayType(DoubleType()))
    return df.withColumn("projection", project_udf(F.col(vec_col)))
