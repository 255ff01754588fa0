"""Tests for storage/scd2.py — SCD Type 2 business-time history."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.storage.scd2 import (
    scd2_apply,
    scd2_asof,
    scd2_current,
)

SCHEMA = "custkey long, segment string, ts string, part string"


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _apply(t, spark, rows, **kw):
    return scd2_apply(
        t, spark, _changes(spark, rows), keys=["custkey"],
        order_col="ts", partition_col="part", **kw
    )


def test_insert_change_close_history(spark, tmp_path):
    t = TxnTable(str(tmp_path / "dim"))
    assert _apply(t, spark, [(1, "GOLD", "2024-01-01", "p0")]) == 1
    # Attribute change: closes v1, opens v2 → 2 new version rows.
    assert _apply(t, spark, [(1, "PLAT", "2024-03-01", "p0")]) == 2
    hist = sorted(
        (r["valid_from"], r["valid_to"], r["segment"], r["is_current"])
        for r in t.read(spark).collect()
    )
    assert hist == [
        ("2024-01-01", "2024-03-01", "GOLD", False),
        ("2024-03-01", None, "PLAT", True),
    ]
    cur = scd2_current(t, spark).collect()
    assert [(r["custkey"], r["segment"]) for r in cur] == [(1, "PLAT")]


def test_noop_stale_and_replay_write_nothing(spark, tmp_path):
    t = TxnTable(str(tmp_path / "dim"))
    _apply(t, spark, [(1, "GOLD", "2024-01-01", "p0")])
    # Same attributes, later ts: no phantom version.
    assert _apply(t, spark, [(1, "GOLD", "2024-06-01", "p0")]) == 0
    # Older-than-current change: stale, dropped.
    assert _apply(t, spark, [(1, "SILVER", "2023-01-01", "p0")]) == 0
    assert t.read(spark).count() == 1


def test_batch_collapses_to_latest_per_key(spark, tmp_path):
    t = TxnTable(str(tmp_path / "dim"))
    n = _apply(
        t,
        spark,
        [
            (1, "GOLD", "2024-01-01", "p0"),
            (1, "SILVER", "2024-02-01", "p0"),  # latest for key 1 wins
            (2, "BASE", "2024-01-15", "p1"),
        ],
    )
    assert n == 2  # one current row per key; no intra-batch history
    cur = {r["custkey"]: r["segment"] for r in scd2_current(t, spark).collect()}
    assert cur == {1: "SILVER", 2: "BASE"}


def test_asof_business_time_travel(spark, tmp_path):
    t = TxnTable(str(tmp_path / "dim"))
    _apply(t, spark, [(1, "GOLD", "2024-01-01", "p0")])
    _apply(t, spark, [(1, "PLAT", "2024-03-01", "p0")])
    _apply(t, spark, [(1, "DIAM", "2024-07-01", "p0")])
    asof = lambda ts: [
        r["segment"] for r in scd2_asof(t, spark, ts).collect()
    ]
    assert asof("2023-12-31") == []  # before the key existed
    assert asof("2024-01-01") == ["GOLD"]  # inclusive lower bound
    assert asof("2024-02-15") == ["GOLD"]
    assert asof("2024-03-01") == ["PLAT"]  # exclusive upper bound on GOLD
    assert asof("2025-01-01") == ["DIAM"]  # open interval = current
    # System-time travel composes: at table version 0 only GOLD existed.
    v0 = t.read(spark, version=0).collect()
    assert [(r["segment"], r["is_current"]) for r in v0] == [("GOLD", True)]


def test_exactly_once_markers(spark, tmp_path):
    t = TxnTable(str(tmp_path / "dim"))
    rows = [(1, "GOLD", "2024-01-01", "p0")]
    assert _apply(t, spark, rows, app_id="scd", batch_id=0) == 1
    # Replay of the same batch: attribute-equal → no-op before the marker
    # even matters; nothing is written either way.
    assert _apply(t, spark, rows, app_id="scd", batch_id=0) == 0
    assert t.read(spark).count() == 1


def test_streaming_scd2_end_to_end(spark, tmp_path):
    import os

    from data_lake_medallion_architecture_project_spark.streaming import run_streaming_scd2

    src = str(tmp_path / "changes")
    table_path = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        _changes(spark, rows).coalesce(1).write.mode("append").parquet(src)

    run = lambda: run_streaming_scd2(
        spark, src, table_path, keys=["custkey"], order_col="ts",
        partition_col="part", checkpoint_root=ckpt,
    )

    land([(1, "GOLD", "2024-01-01", "p0")])
    assert run() == 1
    # Nothing new: the checkpoint prevents re-reading, nothing is written.
    assert run() == 0
    # A change file lands: the catch-up run closes GOLD and opens PLAT.
    land([(1, "PLAT", "2024-03-01", "p0"), (2, "BASE", "2024-02-01", "p1")])
    assert run() == 3  # closed GOLD + new PLAT + new key 2
    t = TxnTable(table_path)
    cur = {r["custkey"]: r["segment"]
           for r in t.read(spark).filter("is_current").collect()}
    assert cur == {1: "PLAT", 2: "BASE"}
    assert t.read(spark).count() == 3  # full history retained
    assert os.path.isdir(os.path.join(ckpt, "scd2"))  # checkpointed stream


def test_point_in_time_join_enriches_at_event_time(spark, tmp_path):
    from data_lake_medallion_architecture_project_spark.storage.scd2 import scd2_pit_join

    t = TxnTable(str(tmp_path / "dim"))
    _apply(t, spark, [(1, "GOLD", "2024-01-01", "p0")])
    _apply(t, spark, [(1, "PLAT", "2024-03-01", "p0")])
    _apply(t, spark, [(2, "BASE", "2024-02-01", "p1")])
    facts = spark.createDataFrame(
        [
            (100, 1, "2023-12-30"),  # before key 1 existed → NULL
            (101, 1, "2024-01-01"),  # exactly at valid_from → GOLD
            (102, 1, "2024-02-15"),  # mid-interval → GOLD
            (103, 1, "2024-03-01"),  # boundary → PLAT (inclusive lower)
            (104, 1, "2024-12-31"),  # open interval → PLAT
            (105, 2, "2024-06-01"),  # other key → BASE
            (106, 3, "2024-06-01"),  # unknown key → NULL
        ],
        "order_id long, custkey long, ts string",
    )
    got = {
        r["order_id"]: r["segment"]
        for r in scd2_pit_join(facts, t, spark, ["custkey"], "ts").collect()
    }
    assert got == {
        100: None, 101: "GOLD", 102: "GOLD", 103: "PLAT",
        104: "PLAT", 105: "BASE", 106: None,
    }
    # All fact rows and columns survive; dimension bookkeeping does not leak.
    out = scd2_pit_join(facts, t, spark, ["custkey"], "ts")
    assert out.count() == 7
    assert {"valid_from", "valid_to", "is_current"} & set(out.columns) == set()
