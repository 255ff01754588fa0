"""Z-order layout tests: measured file-skipping on two independent columns."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.storage.layout import skipping_stats, z_value, zorder_by


def _two_col_df(spark, n=200_000):
    return spark.range(n).select(
        "id",
        (F.xxhash64("id") % 100_000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 100_000).alias("b"),
    )


def test_z_value_interleaves_bits(spark):
    # x=0b11, y=0b00 -> z=0b0101; x=0b00, y=0b11 -> z=0b1010.
    row = (
        spark.range(1)
        .select(
            z_value([F.lit(3).cast("long"), F.lit(0).cast("long")], 2).alias("xz"),
            z_value([F.lit(0).cast("long"), F.lit(3).cast("long")], 2).alias("yz"),
        )
        .collect()[0]
    )
    assert row["xz"] == 0b0101
    assert row["yz"] == 0b1010


def test_zorder_prunes_both_columns(spark, tmp_path):
    df = _two_col_df(spark)
    by_a = str(tmp_path / "by_a")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(by_a)
    zo = str(tmp_path / "zorder")
    zorder_by(df, ["a", "b"], n_files=16).write.parquet(zo)

    lo, hi = -30_000, -29_000  # a 1%-wide range inside the hash domain

    # Linear layout: perfect on the sort column, useless on the other.
    a_hit, a_tot = skipping_stats(by_a, "a", lo, hi)
    b_hit, b_tot = skipping_stats(by_a, "b", lo, hi)
    assert a_hit <= 2 and a_tot == 16
    assert b_hit == b_tot  # zero pruning on b

    # Z-order: real pruning on BOTH columns.
    za_hit, za_tot = skipping_stats(zo, "a", lo, hi)
    zb_hit, zb_tot = skipping_stats(zo, "b", lo, hi)
    assert za_tot == 16 and zb_tot == 16
    assert za_hit <= 8
    assert zb_hit <= 8


def test_zorder_preserves_rows_and_schema(spark, tmp_path):
    df = _two_col_df(spark, n=10_000)
    out = str(tmp_path / "z")
    zorder_by(df, ["a", "b"], n_files=4).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.columns == df.columns  # internal columns dropped
    assert back.count() == 10_000
    assert back.select(F.sum("a"), F.sum("b")).collect() == df.select(
        F.sum("a"), F.sum("b")
    ).collect()
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 4
