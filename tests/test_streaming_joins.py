"""Stream-stream interval join tests (streaming/joins.py).

Drive two-batch file sources under Trigger.AvailableNow; the inner join must
match the batch range-join twin exactly, and the left-outer variant must emit
no-click purchases once the watermark (pushed by a sentinel file) proves no
match can arrive.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.streaming.joins import purchases_with_clicks_stream


def _event_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _write_batches(spark, path, batches):
    for rows in batches:
        _event_rows(spark, rows).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)


def _run(spark, src, out_dir, ckpt, how):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        purchases_with_clicks_stream(stream, how=how)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    return spark.read.parquet(out_dir)


_BATCHES = [
    # batch 1: u1 purchase @01:00 with clicks at +5m, +59m (in) and +61m (out);
    # u2 purchase @01:30 with a click BEFORE it (out).
    [
        (0, "2024-01-01 01:00:00", 1, "purchase", 1.0, "{}"),
        (1, "2024-01-01 01:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 01:59:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 02:01:00", 1, "click", 1.0, "{}"),
        (4, "2024-01-01 01:30:00", 2, "purchase", 1.0, "{}"),
        (5, "2024-01-01 01:20:00", 2, "click", 1.0, "{}"),
    ],
    # batch 2: a click for u2 arriving in a LATER micro-batch but inside the
    # window (the case batch recomputation gets free and streaming must buffer
    # for); u3 purchase with no clicks at all.
    [
        (6, "2024-01-01 02:10:00", 2, "click", 1.0, "{}"),
        (7, "2024-01-01 02:30:00", 3, "purchase", 1.0, "{}"),
    ],
    # Two sentinel batches far in the future, each carrying BOTH event types:
    # every side's watermark clock advances only on rows surviving its own
    # type filter (see joins.py), so a purchase-AND-click heartbeat is needed
    # to move the combined (min) watermark. Two batches because a watermark
    # computed at batch end only takes EFFECT in the next micro-batch —
    # under AvailableNow the outer-join null rows flush while processing the
    # SECOND sentinel batch, whose starting watermark already exceeds the
    # real rows' expiry. Assertions ignore ids ≥ 90.
    [
        (99, "2024-01-03 00:00:00", 99, "purchase", 1.0, "{}"),
        (98, "2024-01-03 00:00:00", 99, "click", 1.0, "{}"),
    ],
    [
        (100, "2024-01-05 00:00:00", 99, "purchase", 1.0, "{}"),
        (101, "2024-01-05 00:00:00", 99, "click", 1.0, "{}"),
    ],
]


def _batch_twin(spark, src):
    ev = spark.read.parquet(src).filter(F.col("event_id") < 90)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") < F.col("p_ts") + F.expr("interval 1 hour"))
    )
    return p.join(c, cond, "inner").select("purchase_id", "c_ts")


def test_stream_stream_inner_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src, _BATCHES)
    got = _run(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"), "inner")
    g = sorted(
        (r["purchase_id"], str(r["c_ts"]))
        for r in got.collect()
        if r["purchase_id"] < 90
    )
    b = sorted(
        (r["purchase_id"], str(r["c_ts"])) for r in _batch_twin(spark, src).collect()
    )
    assert g == b
    # The cross-micro-batch match (u2's later click) is present: state
    # buffering across triggers worked.
    assert any(pid == 4 for pid, _ in g)


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src, _BATCHES)
    got = _run(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"), "left_outer"
    )
    rows = [r for r in got.collect() if r["purchase_id"] < 90]
    matched = [(r["purchase_id"], str(r["c_ts"])) for r in rows if r["c_ts"] is not None]
    unmatched = [r["purchase_id"] for r in rows if r["c_ts"] is None]
    b = sorted(
        (r["purchase_id"], str(r["c_ts"])) for r in _batch_twin(spark, src).collect()
    )
    assert sorted(matched) == b
    # u3's purchase (id 7) has no in-window click; the sentinel batches
    # forced its null row out.
    assert unmatched == [7]
