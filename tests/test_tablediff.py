"""Tests for operators/tablediff.py — classification and null handling."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.operators.tablediff import (
    diff_summary,
    table_diff,
)


def test_classifies_all_three_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        ["k", "s", "v"],
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", None), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
    # 1 equal (absent), 2 changed, 3 left_only, 4 equal incl. NULL==NULL, 5 right_only
    assert got == {2: "changed", 3: "left_only", 5: "right_only"}


def test_null_vs_value_is_a_change(spark):
    left = spark.createDataFrame([(1, None)], "k int, v double")
    right = spark.createDataFrame([(1, 0.0)], "k int, v double")
    got = table_diff(left, right, ["k"]).collect()
    assert [(r["k"], r["status"]) for r in got] == [(1, "changed")]


def test_all_null_row_still_counts_as_present(spark):
    # A row whose every compared column is NULL must not be misread as
    # "absent" on either side — presence is tracked explicitly.
    left = spark.createDataFrame([(1, None), (2, None)], "k int, v double")
    right = spark.createDataFrame([(1, None)], "k int, v double")
    got = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {2: "left_only"}  # key 1: NULL==NULL, equal, dropped


def test_identical_tables_diff_empty_and_summary_shape(spark):
    df = spark.createDataFrame([(i, f"s{i}", float(i)) for i in range(50)],
                               ["k", "s", "v"])
    diff = table_diff(df, df, ["k"])
    assert diff.count() == 0
    left = df
    right = df.filter("k < 40")
    s = {r["status"]: r for r in
         diff_summary(table_diff(left, right, ["k"]), ["k"]).collect()}
    assert s["left_only"]["n"] == 10
    assert s["left_only"]["first_key"] == 40 and s["left_only"]["last_key"] == 49
