"""Round-11 scale probes.

1. semdedup_keep_list: single-scan (eager localCheckpoint) vs the old
   3-branch re-derivation, interleaved A/B at sf0.1 (the bench-variance
   protocol: alternate passes, never sequential blocks).
2. PNG vs BMP decode cost through the dHash pipeline at sf0.1 — what the
   compressed-format path costs relative to raw BMP.

Usage: python tools/probe_r11.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402
from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY  # noqa: E402


def old_semdedup_keep_list(spark, sf_dir):
    """The pre-round-11 form: three branches each re-derive ranked."""
    from pyspark.sql import Window

    from data_lake_medallion_architecture_project_spark.functions.vectors import dot
    from data_lake_medallion_architecture_project_spark.plans.curation import (
        _SEMDEDUP_TAU,
        _sem_scored,
    )

    ranked = _sem_scored(spark, sf_dir).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("centroid").orderBy("affinity", "vec_id")
        ),
    )
    a = ranked.select(
        F.col("centroid").alias("ca"), F.col("rk").alias("rka"),
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = ranked.select(
        F.col("vec_id").alias("rm_id"), F.col("centroid").alias("cb"),
        F.col("rk").alias("rkb"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    removed = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("rka") < F.col("rkb")))
        .filter(
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select("rm_id")
        .distinct()
    )
    return ranked.join(removed, ranked.vec_id == removed.rm_id, "left").select(
        "vec_id", F.col("centroid").cast("long").alias("centroid"),
        "affinity", F.col("rm_id").isNull().alias("is_kept"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["top_orders"].build(spark, sf_dir).limit(1).collect()

    # --- probe 1: interleaved A/B, 4 passes each ------------------------- #
    new_t, old_t = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        REGISTRY["semdedup_keep_list"].build(spark, sf_dir).collect()
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        old_semdedup_keep_list(spark, sf_dir).collect()
        old_t.append(time.perf_counter() - t0)
    new_rows = sorted(
        tuple(r) for r in REGISTRY["semdedup_keep_list"].build(spark, sf_dir).collect()
    )
    old_rows = sorted(tuple(r) for r in old_semdedup_keep_list(spark, sf_dir).collect())
    print("semdedup single-scan vs 3-branch (interleaved, warm passes):")
    print(f"  new (localCheckpoint): {[round(t, 2) for t in new_t]}")
    print(f"  old (re-derive x3):    {[round(t, 2) for t in old_t]}")
    print(f"  identical results: {new_rows == old_rows}")

    # --- probe 2: PNG vs BMP decode through dHash ------------------------ #
    bmp_t, png_t = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        REGISTRY["image_dhash_catalog"].build(spark, sf_dir).collect()
        bmp_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        REGISTRY["image_dhash_catalog_png"].build(spark, sf_dir).collect()
        png_t.append(time.perf_counter() - t0)
    n = REGISTRY["image_dhash_catalog"].build(spark, sf_dir).count()
    print(f"dHash over {n} images (interleaved):")
    print(f"  BMP: {[round(t, 2) for t in bmp_t]}")
    print(f"  PNG: {[round(t, 2) for t in png_t]}")


if __name__ == "__main__":
    main()
