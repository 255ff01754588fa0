"""Bucketed range join — the scale path for interval/temporal joins.

Spark has no native range-join strategy: a pure inequality join plans as
BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, broadcast of a whole side).
The standard fix is bucket-then-refine:

1. quantize time into buckets of the window width;
2. explode the probe side into every bucket its window can overlap
   (window ≤ bucket width → at most 2 buckets per row);
3. equi-join on the bucket key — a plain shuffled/broadcast hash join that
   Catalyst and AQE optimize like any other;
4. refine with the exact range predicate.

Cost becomes O(pairs sharing a bucket) instead of O(|L|·|R|), and the join
parallelizes on the bucket key. All arithmetic is integer microseconds
(`unix_micros`) — timestamps ARE int64 micros in both Spark and the DuckDB
oracle, so bucket and range comparisons are exact (double epoch-seconds would
wobble at the microsecond boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Exact int64 microseconds for TIMESTAMP or TIMESTAMP_NTZ columns.

    ``unix_micros`` rejects TIMESTAMP_NTZ (the type parquet timestamps read
    back as when written without a zone); for NTZ we diff against an NTZ epoch
    literal, which is pure wall-clock arithmetic — no session-timezone
    dependence, identical to DuckDB's epoch_us on naive timestamps.
    """
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        quoted = "`" + ts_col.replace("`", "``") + "`"
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {quoted})"
        )
    return F.unix_micros(F.col(ts_col))


def events_in_window_counts(
    anchors: DataFrame,
    probes: DataFrame,
    anchor_id: str,
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """For each anchor row, count probe rows with ts in [anchor.ts,
    anchor.ts + window). Anchors with no probes in window get 0.

    Returns (anchor_id, n_in_window).

    Both sides must carry the same timestamp type: ``_micros`` dispatches
    per-DataFrame, and mixing NTZ with zoned timestamps under a non-UTC
    session timezone would put the two sides on different epoch bases.
    """
    a_type = anchors.schema[ts_col].dataType
    p_type = probes.schema[ts_col].dataType
    if a_type != p_type:
        raise TypeError(
            f"anchors.{ts_col} is {a_type} but probes.{ts_col} is {p_type}; "
            "both sides must use the same timestamp type so microsecond "
            "arithmetic shares one epoch base"
        )
    a = anchors.select(
        F.col(anchor_id).alias("_aid"),
        _micros(anchors, ts_col).alias("_aus"),
    ).withColumn("_bucket", (F.col("_aus") / window_us).cast("long"))

    p_us = _micros(probes, ts_col)
    # A probe at bucket b can fall inside windows anchored in bucket b or b-1
    # (window width == bucket width), so it probes both.
    p = (
        probes.select(p_us.alias("_pus"))
        .withColumn(
            "_bucket",
            F.explode(
                F.array(
                    (F.col("_pus") / window_us).cast("long"),
                    (F.col("_pus") / window_us).cast("long") - 1,
                )
            ),
        )
    )

    matched = (
        a.join(p, "_bucket")
        .filter((F.col("_pus") >= F.col("_aus")) & (F.col("_pus") < F.col("_aus") + window_us))
        .groupBy("_aid")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        a.select("_aid")
        .join(matched, "_aid", "left_outer")
        .select(
            F.col("_aid").alias(anchor_id),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_in_window"),
        )
    )
