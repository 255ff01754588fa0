"""End-to-end tests for the streaming CDC-style upsert (streaming/upsert)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming import (
    latest_per_key,
    run_streaming_upsert,
)

_SCHEMA = "date string, k string, v long, seq long"


def _write_changes(spark, src_dir, rows, fname):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(src_dir)
    )
    _ = fname  # file-source discovers any new file; name is irrelevant


def _state(spark, table_path):
    return sorted(
        map(tuple, TxnTable(table_path).read(spark).select("date", "k", "v", "seq").collect())
    )


def test_latest_per_key_collapses_to_max_order(spark):
    df = spark.createDataFrame(
        [("d1", "a", 1, 1), ("d1", "a", 2, 3), ("d1", "a", 9, 2), ("d2", "b", 5, 1)],
        _SCHEMA,
    )
    got = sorted(map(tuple, latest_per_key(df, ["k"], "seq").collect()))
    assert got == [("d1", "a", 2, 3), ("d2", "b", 5, 1)]
    assert latest_per_key(df, ["k"], "seq").columns == df.columns


def test_streaming_upsert_applies_inserts_then_updates(spark, tmp_path):
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write_changes(
        spark, src, [("d1", "a", 1, 1), ("d1", "b", 2, 1), ("d2", "c", 3, 1)], "f0"
    )
    assert run_streaming_upsert(spark, src, table, ["k"], "date", "seq", ckpt) >= 1
    assert _state(spark, table) == [
        ("d1", "a", 1, 1),
        ("d1", "b", 2, 1),
        ("d2", "c", 3, 1),
    ]

    # Second wave: update a (twice in one batch — latest wins), move c to a
    # new partition, insert d.
    _write_changes(
        spark,
        src,
        [("d1", "a", 10, 2), ("d1", "a", 11, 3), ("d3", "c", 30, 2), ("d2", "d", 4, 1)],
        "f1",
    )
    assert run_streaming_upsert(spark, src, table, ["k"], "date", "seq", ckpt) >= 1
    assert _state(spark, table) == [
        ("d1", "a", 11, 3),
        ("d1", "b", 2, 1),
        ("d2", "d", 4, 1),
        ("d3", "c", 30, 2),
    ]

    # Nothing new: the checkpoint makes the re-run a no-op.
    v = TxnTable(table).snapshot().version
    run_streaming_upsert(spark, src, table, ["k"], "date", "seq", ckpt)
    assert TxnTable(table).snapshot().version == v
    assert _state(spark, table) == [
        ("d1", "a", 11, 3),
        ("d1", "b", 2, 1),
        ("d2", "d", 4, 1),
        ("d3", "c", 30, 2),
    ]


def test_streaming_upsert_replay_after_lost_checkpoint_is_exactly_once(
    spark, tmp_path
):
    """The crash window: table commit succeeded, checkpoint advance lost.
    Replaying from a fresh checkpoint re-delivers the batch; the (app_id,
    batch_id) txn marker must make the re-apply a table-level no-op."""
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")

    _write_changes(spark, src, [("d1", "a", 1, 1)], "f0")
    run_streaming_upsert(spark, src, table, ["k"], "date", "seq", str(tmp_path / "c1"))
    v = TxnTable(table).snapshot().version
    before = _state(spark, table)

    # Fresh checkpoint → the same files replay as the same batch ids.
    run_streaming_upsert(spark, src, table, ["k"], "date", "seq", str(tmp_path / "c2"))
    assert TxnTable(table).snapshot().version == v  # no new commit
    assert _state(spark, table) == before
