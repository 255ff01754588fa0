"""Tests for operators/freqitems.py — the pigeonhole recall guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.freqitems import frequent_items


def _exact(tokens, col, k):
    n = tokens.count()
    return {
        (r["item"], r["n"])
        for r in tokens.select(F.col(col).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > n)
        .collect()
    }


def test_matches_exact_groupby(spark):
    df = spark.createDataFrame(
        [(f"t{i % 37}",) for i in range(5000)] + [("hot",)] * 500, ["w"]
    ).repartition(8)
    got = {(r["item"], r["n"]) for r in frequent_items(df, "w", 20).collect()}
    assert got == _exact(df, "w", 20)
    assert ("hot", 500) in got


def test_recall_when_item_spread_thin_across_partitions(spark):
    # Adversarial placement: 'rare-ish' is just above the global threshold but
    # evenly smeared over all partitions, so no partition sees it as clearly
    # hot. The local rule c_p*k > N_p must still catch it somewhere — the
    # pigeonhole argument, exercised rather than assumed.
    rows = [("filler%d" % i,) for i in range(4000)] + [("smeared",)] * 450
    df = spark.createDataFrame(rows, ["w"]).repartition(16)  # hash-smears rows
    k = 9  # threshold: 4450/9 ≈ 494.4 — 'smeared' at 450 is NOT frequent
    got = {r["item"] for r in frequent_items(df, "w", k).collect()}
    assert "smeared" not in got  # below threshold → correctly excluded
    k = 10  # threshold 445 — now it is frequent, while spread thin
    got = {(r["item"], r["n"]) for r in frequent_items(df, "w", k).collect()}
    assert ("smeared", 450) in got
    assert got == _exact(df, "w", k)


def test_empty_and_all_unique(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(100)], ["w"]).repartition(4)
    assert frequent_items(df, "w", 50).count() == 0
