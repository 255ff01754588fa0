"""Streaming windowed aggregation + custom stateful sessionizer tests.

Drive with a file source (parquet events written in two batches) under
Trigger.AvailableNow; assert window results match the batch twin and that the
stateful sessionizer closes sessions on gaps."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.schemas import TESTDATA_SCHEMAS
from data_lake_medallion_architecture_project_spark.streaming.windows import (
    streaming_sessionize,
    windowed_event_counts,
)


def _event_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def event_dir(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (i, f"2024-01-01 0{h}:{m:02d}:00", i % 5, t, 1.0, "{}")
        for i, (h, m, t) in enumerate(
            [
                (1, 5, "click"), (1, 25, "view"), (1, 45, "click"),
                (2, 5, "purchase"), (2, 35, "click"), (3, 55, "view"),
            ]
        )
    ]
    df = spark.createDataFrame(
        [(e, ts, u, t, v, p) for (e, ts, u, t, v, p) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(src)
    return src


def test_windowed_counts_match_batch(spark, tmp_path, event_dir):
    # Append-mode watermarked windows only emit once the watermark passes the
    # window end, and the watermark only advances BETWEEN micro-batches. Feed
    # the files one per trigger, with a late sentinel file that pushes the
    # watermark far past the real data so every data window finalizes.
    import time

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    event_dir = str(tmp_path / "ordered_src")
    # Three single-file appends with distinct mtimes → deterministic
    # file-source order → the watermark advances monotonically through them.
    batches = [
        [(0, "2024-01-01 01:05:00", 0, "click", 1.0, "{}"),
         (1, "2024-01-01 01:25:00", 1, "view", 1.0, "{}"),
         (2, "2024-01-01 01:45:00", 2, "click", 1.0, "{}")],
        [(3, "2024-01-01 02:05:00", 3, "purchase", 1.0, "{}"),
         (4, "2024-01-01 02:35:00", 4, "click", 1.0, "{}"),
         (5, "2024-01-01 03:55:00", 0, "view", 1.0, "{}")],
        [(99, "2024-01-02 12:00:00", 99, "click", 1.0, "{}")],  # sentinel
    ]
    for rows in batches:
        _event_rows(spark, rows).coalesce(1).write.mode("append").parquet(event_dir)
        time.sleep(1.1)

    schema = spark.read.parquet(event_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(event_dir)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    batch = (
        spark.read.parquet(event_dir)
        .filter(F.col("event_id") != 99)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # Every emitted window must match its batch twin, and all real-data
    # windows (pushed past the watermark by the sentinel) must have emitted.
    for k, v in g.items():
        if k in b:
            assert v == b[k], k
    assert set(b) <= set(g)


def test_streaming_sessionize_event_time_closure(spark, tmp_path, event_dir):
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive  # event-time timeouts terminate under AvailableNow
    sessions = spark.read.parquet(out_dir).collect()
    by_user = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    # Events per user (fixture): u0 @01:05 & 03:55, u1 @01:25, u2 @01:45,
    # u3 @02:05, u4 @02:35. Final watermark = 03:55.
    # u0's first session closes via in-batch gap (>30 min to the next event).
    u0 = sorted(by_user[0], key=lambda r: r["session_start"])
    assert u0[0]["close_reason"] == "gap"
    assert u0[0]["n_events"] == 1
    # Sessions whose last event is > gap older than the final watermark close
    # with "timeout": u1 (01:25), u2 (01:45), u3 (02:05) are all due by 03:55.
    for uid in (1, 2, 3):
        assert [r["close_reason"] for r in by_user[uid]] == ["timeout"], uid
    # u0's 03:55 session is NOT due at watermark 03:55 → still open in state.
    assert len(u0) == 1
    for rs in by_user.values():
        for r in rs:
            assert r["session_end"] >= r["session_start"]
            assert r["n_events"] >= 1


def test_late_data_within_watermark_is_counted(spark, tmp_path):
    """A late event arriving within the watermark bound still lands in its
    (already-open) window; an event later than the bound is dropped. Batches
    are fed one file per trigger so the watermark advances deterministically
    between them."""
    import time

    src = str(tmp_path / "late_src")
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    batches = [
        # Batch 1: two events in the 10:00 window; max event time 10:50.
        [(0, "2024-01-01 10:05:00", 0, "click", 1.0, "{}"),
         (1, "2024-01-01 10:50:00", 1, "click", 1.0, "{}")],
        # Batch 2: watermark is now 10:50-30min = 10:20. A 10:15 event is
        # LATE but within the 30-min bound → must be counted. Also advance
        # event time to 13:00 (watermark → 12:30 closes the 10:00 window).
        [(2, "2024-01-01 10:15:00", 2, "click", 1.0, "{}"),
         (3, "2024-01-01 13:00:00", 3, "click", 1.0, "{}")],
        # Batch 3: sentinel pushes the watermark past everything so all
        # windows finalize and emit.
        [(5, "2024-01-02 12:00:00", 5, "view", 1.0, "{}")],
    ]
    for rows in batches:
        _event_rows(spark, rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
        if r["window_start"].day == 1
    }
    # 10:00 window: events 0 and 1 plus the LATE-but-within-bound event 2
    # (arrived after the watermark reached 10:20, inside the 30-min bound) →
    # all 3 clicks counted. This is the guarantee watermarking makes; note
    # dropping of too-late rows is best-effort, not asserted here.
    assert got[(10, "click")] == 3, got
    assert got[(13, "click")] == 1, got


def test_drop_duplicates_within_watermark_bounded_state(spark, tmp_path):
    """Native bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    duplicate event_ids arriving within the watermark are dropped, and the
    dedup state is EXPIRED once the watermark passes — the property that
    keeps streaming dedup viable at 100 TB, where an unbounded
    dropDuplicates state table is the classic failure mode. (The txn-layer
    twin, streaming/dedup_ingest.py, trades state-in-memory for
    state-in-table; this is the in-flight, at-least-once variant.)"""
    import time

    src = str(tmp_path / "dd_src")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    schema = "event_id long, ts timestamp"

    def write_batch(rows, name):
        (
            spark.createDataFrame(rows, "event_id long, ts string")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    # Batch 1: event 1 plus an in-batch duplicate; batch 2: the same event
    # again (still within the watermark → dropped) plus a sentinel far in
    # the future that advances the watermark past event 1's dedup window.
    write_batch([(1, "2024-01-01 01:00:00"), (1, "2024-01-01 01:00:00")], "b1")
    write_batch([(1, "2024-01-01 01:00:05"), (99, "2024-01-01 10:00:00")], "b2")

    progresses = []
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]

    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 99]  # both duplicates of event 1 dropped

    # State boundedness: after the sentinel advanced the watermark, the
    # dedup operator evicted event 1's key — rows removed is recorded in
    # the final progress with state rows back at the live-key count.
    last = progresses[-1]["stateOperators"][0]
    assert last["numRowsTotal"] <= 2, last
