"""Bucketed co-located join: same result as the plain join, and the physical
plan contains no Exchange (the write-time shuffle replaces every query-time
shuffle)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.sources.bucketing import bucketed_join, write_bucketed_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.range(10_000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 97).alias("o_custkey")
    )
    lineitem = spark.range(40_000).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
    )
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Tables this small auto-broadcast, which would hide the bucketing;
        # at fact⋈fact scale broadcast is off the table and the bucketed
        # merge join is the plan of interest.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(orders, "b_orders", str(tmp_path / "o"), "o_orderkey")
        write_bucketed_table(lineitem, "b_lineitem", str(tmp_path / "l"), "l_orderkey")

        joined = bucketed_join(
            spark, "b_orders", "b_lineitem", F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: write-time shuffle only

        got = joined.groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
        expect = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
