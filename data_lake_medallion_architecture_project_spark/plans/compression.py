"""Embedding compression — int8 quantization for the vector columns.

At 100 TB the embedding store dominates bytes (10⁹ × 768-d float32 ≈ 3 TB
per corpus copy); symmetric per-vector int8 quantization cuts it 4× and is
the standard serving/ANN-index format. The operator family:

* quantize: ``scale = max|v| / 127``, ``q_i = floor(v_i/scale + 0.5)`` —
  ``floor(x + 0.5)`` instead of ``round(x)`` because round's half-way
  behavior on binary doubles is the one thing engines genuinely disagree on
  (same discipline as functions/money.py), while floor(x + 0.5) is the same
  IEEE add-then-floor everywhere.
* reconstruction error: ``max_i |v_i − q_i·scale|`` — bounded by scale/2 by
  construction; the registry query materializes it per vector so the bound
  is *checked*, not assumed.

All pure-JVM array folds (map-only, no shuffle, no Python). CSE note: the
``scale`` expression is projected to a named column BEFORE the lambdas that
reference it — Catalyst does no CSE inside lambda bodies (see
functions/text.py:top_gram_mass for the measured 10× lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array
from ..sources.readers import load_table
from .registry import register

_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM v
)
SELECT vec_id,
       scale,
       CASE WHEN scale > 0 THEN
         list_max(list_transform(v, x -> abs(x - floor(x / scale + 0.5) * scale)))
       ELSE 0.0 END AS max_abs_err
FROM s
"""


@register(
    "embedding_quantization_error",
    oracle=_QUANT_ORACLE,
    tags=("similarity", "compression"),
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit: the symmetric scale and the exact
    max reconstruction error (≤ scale/2 by construction — materialized so
    the bound is checked against the oracle, not assumed). Map-only: one
    corpus pass of pure-JVM array folds; at scale the same expressions write
    the quantized column alongside (4× smaller store, dequantize-on-read)."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_v = emb.select("vec_id", to_double_array("embedding").alias("v"))
    with_scale = with_v.select(
        "vec_id",
        "v",
        (
            F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
        ).alias("scale"),
    )
    err = F.array_max(
        F.transform(
            "v",
            lambda x: F.abs(
                x - F.floor(x / F.col("scale") + 0.5) * F.col("scale")
            ),
        )
    )
    return with_scale.select(
        "vec_id",
        "scale",
        F.when(F.col("scale") > 0, err).otherwise(F.lit(0.0)).alias("max_abs_err"),
    )
