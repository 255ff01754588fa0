"""Distributed logistic regression — the fastText-style quality-classifier
trainer for corpus filtering.

Web-corpus pipelines gate documents with a tiny supervised classifier
("does this look like reference text or like boilerplate?") scored over
cheap features (length, token stats, punctuation ratios — the signals
``doc_quality_scores`` already computes). This module trains that
classifier ON the cluster over the full corpus — no sampling down to a
driver-sized table — with the same execution shape as the other model
fitters here (k-means, BPE, PCA):

* **One standardization pass.** Exact per-feature mean/std via a single
  JVM aggregation; broadcast. GD on raw web-scale features (chars in
  1..10⁶) barely moves — standardization makes the fixed learning rate
  meaningful.
* **Full-batch GD, model-sized traffic per step.** Each iteration, every
  partition folds its rows into one gradient partial
  Σ xᵢ(σ(w·xᵢ) − yᵢ) with BLAS (``mapInArrow``), emitting d+1 floats;
  the driver sums partials, applies the L2-regularized update, and
  re-broadcasts w. No corpus shuffle, ever; iterations cost one map pass.
  Deterministic: zero init, fixed schedule, associative float partials
  (partition-count invariance proven in tests to ~1e-9).
* **Inference is pure JVM.** Scoring needs only σ(w·x) with literal
  weights — emitted as built-in column expressions (no UDF at all), so
  the corpus-filtering pass whole-stage-codegens like any other filter.

The closed-form numpy twin in ``tests/test_logreg.py`` runs the identical
schedule and must agree to float precision — the test IS the spec.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LogRegModel",
    "fit_logreg",
    "logit_expr",
    "pinned_quality_logit",
    "score_logreg",
]


@dataclass(frozen=True)
class LogRegModel:
    feature_cols: tuple[str, ...]
    mean: np.ndarray  # (d,) standardization means
    std: np.ndarray  # (d,) standardization stds (>= eps)
    weights: np.ndarray  # (d,) on standardized features
    bias: float


def _grad_batches(batches, d: int, w, b, mean, std):
    """Per-partition gradient partial: one row (n, Σ xᵢ·r, Σ r) where
    r = σ(w·x+b) − y and x is standardized."""
    import pyarrow as pa

    n = 0
    gw = np.zeros(d, dtype=np.float64)
    gb = 0.0
    for batch in batches:
        cols = [
            batch.column(i).to_numpy(zero_copy_only=False).astype(np.float64)
            for i in range(d)
        ]
        y = batch.column(d).to_numpy(zero_copy_only=False).astype(np.float64)
        if not len(y):
            continue
        x = (np.stack(cols, axis=1) - mean) / std
        z = x @ w + b
        r = 1.0 / (1.0 + np.exp(-z)) - y
        n += len(y)
        gw += x.T @ r
        gb += float(r.sum())
    yield pa.RecordBatch.from_pydict(
        {
            "n": pa.array([n], pa.int64()),
            "gw": pa.array([gw.tolist()], pa.list_(pa.float64())),
            "gb": pa.array([gb], pa.float64()),
        }
    )


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    n_iters: int = 100,
    lr: float = 0.5,
    l2: float = 0.0,
) -> LogRegModel:
    """Train by full-batch gradient descent (zero init, fixed schedule)."""
    d = len(feature_cols)
    proj = df.select(
        *[F.col(c).cast("double") for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    )
    stats = proj.agg(
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feature_cols)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feature_cols)],
    ).collect()[0]
    mean = np.array([stats[f"m{i}"] for i in range(d)], dtype=np.float64)
    std = np.maximum(
        np.array([stats[f"s{i}"] for i in range(d)], dtype=np.float64), 1e-12
    )
    # One cached projection feeds every iteration's map pass.
    proj = proj.localCheckpoint(eager=True)
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(n_iters):
        w_, b_, mean_, std_ = w.copy(), b, mean, std  # bind loop state
        rows = proj.mapInArrow(
            lambda it: _grad_batches(it, d, w_, b_, mean_, std_),
            schema="n long, gw array<double>, gb double",
        ).collect()
        n = sum(r["n"] for r in rows)
        if n == 0:
            raise ValueError("fit_logreg: empty input")
        gw = np.sum([np.array(r["gw"]) for r in rows], axis=0) / n + l2 * w
        gb = sum(r["gb"] for r in rows) / n
        w = w - lr * gw
        b = b - lr * gb
    return LogRegModel(
        feature_cols=tuple(feature_cols), mean=mean, std=std, weights=w, bias=b
    )


def logit_expr(
    feature_cols, mean, std, weights, bias: float
) -> Column:
    """The raw logit z = ((((b + t0) + t1) + ...)) with
    tᵢ = ((xᵢ − μᵢ)/σᵢ)·wᵢ as a pure-JVM column expression. The
    LEFT-ASSOCIATED construction order is load-bearing: the DuckDB oracle
    of ``doc_source_logreg_scores`` replays the identical IEEE sequence, so
    the emitted doubles are bit-equal cross-engine (the PCA discipline).
    Shared by the registry gate query, ``score_logreg``, and the streaming
    quality-gate ingest. Each feature may be a column NAME or a Column
    expression — the latter lets callers feed features without ever
    attaching intermediate columns to the row."""
    z = F.lit(float(bias))
    for c, m, s, w in zip(feature_cols, mean, std, weights):
        col = c if isinstance(c, Column) else F.col(c)
        z = z + ((col.cast("double") - F.lit(float(m))) / F.lit(float(s))) * F.lit(
            float(w)
        )
    return z


def pinned_quality_logit(columns, text_col: str = "text") -> Column:
    """The PINNED quality-classifier logit as ONE self-contained column
    expression over a raw document row — the single scoring surface shared
    by the batch gate query (``doc_source_logreg_scores``), trainprep's
    ``--min-logit`` gate, and the streaming quality-gate ingest.

    Two contracts (both ADVICE-r11 fixes):

    * **No intermediate feature columns.** The features live only inside
      the expression tree, so attaching the logit can never shadow, drop,
      or silently rewrite a stored stat column (``n_chars`` et al.) on its
      way through an intake door.
    * **The n_chars feature is sourced exactly like the certified gate
      query**: the STORED ``n_chars`` column when the schema carries one
      (pass the DataFrame's ``.columns``), ``length(text)`` otherwise —
      so door/batch pass-set parity is structural, not an accident of
      fixture data where the two happen to agree.
    """
    from ..functions.text import (
        distinct_token_count,
        token_count,
        tokenize,
        total_token_chars,
    )
    from ..plans._pinned_logreg import (
        _LOGREG_BIAS,
        _LOGREG_FEATURES,
        _LOGREG_MEAN,
        _LOGREG_STD,
        _LOGREG_WEIGHTS,
    )

    toks = tokenize(text_col)
    n_chars = (
        F.col("n_chars").cast("long")
        if "n_chars" in columns
        else F.length(F.col(text_col)).cast("long")
    )
    feature_exprs = {
        "n_tokens": token_count(toks),
        "n_unique_tokens": distinct_token_count(toks),
        "n_token_chars": total_token_chars(toks),
        "n_chars": n_chars,
    }
    return logit_expr(
        tuple(feature_exprs[f] for f in _LOGREG_FEATURES),
        _LOGREG_MEAN,
        _LOGREG_STD,
        _LOGREG_WEIGHTS,
        _LOGREG_BIAS,
    )


def score_logreg(df: DataFrame, model: LogRegModel) -> Column:
    """σ(w·x + b) as a pure-JVM column expression — literal weights folded
    into whole-stage codegen; no UDF in the corpus-filtering pass."""
    z = logit_expr(model.feature_cols, model.mean, model.std, model.weights, model.bias)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
