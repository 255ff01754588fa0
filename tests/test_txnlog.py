"""Unit tests for the Delta-style transactional table layer (storage/txnlog)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.storage import TxnTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "date string, k string, v long")


def _rows(df):
    return sorted(map(tuple, df.select("date", "k", "v").collect()))


def test_merge_upserts_only_touched_partitions(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(
        _df(spark, [("d1", "a", 1), ("d2", "b", 2)]), "date"
    )
    # MERGE a new version of d2 plus a new d3; d1 must be untouched.
    t.merge_overwrite_partitions(
        _df(spark, [("d2", "b", 20), ("d3", "c", 3)]), "date"
    )
    assert _rows(t.read(spark)) == [("d1", "a", 1), ("d2", "b", 20), ("d3", "c", 3)]
    # Partition-pruned read resolves from log metadata only.
    assert _rows(t.read(spark, partition_values=["d2"])) == [("d2", "b", 20)]


def test_txn_marker_makes_replay_a_noop(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    df = _df(spark, [("d1", "a", 1)])
    assert t.merge_overwrite_partitions(df, "date", app_id="job", batch_id=0) == ["d1"]
    v = t.snapshot().version
    # Replay of the same (app_id, batch_id): skipped, no new version.
    assert t.merge_overwrite_partitions(df, "date", app_id="job", batch_id=0) == []
    assert t.snapshot().version == v
    # A later batch goes through.
    assert t.merge_overwrite_partitions(
        _df(spark, [("d1", "a", 2)]), "date", app_id="job", batch_id=1
    ) == ["d1"]
    assert _rows(t.read(spark)) == [("d1", "a", 2)]


def test_crash_before_commit_is_invisible_and_vacuumable(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    before = _rows(t.read(spark))
    # Simulate a writer dying after staging data files but before the log
    # commit: files exist under _data/ with no commit referencing them.
    orphan_dir = os.path.join(t.data_dir, "deadbeef_crash")
    _df(spark, [("d1", "x", 99)]).write.parquet(orphan_dir)
    assert _rows(t.read(spark)) == before  # readers never see orphans
    assert t.vacuum() > 0  # crash orphans are collectable
    assert _rows(t.read(spark)) == before


def test_time_travel_reconstructs_old_versions(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 2)]), "date")
    assert _rows(t.read(spark, version=0)) == [("d1", "a", 1)]
    assert _rows(t.read(spark)) == [("d1", "a", 2)]
    # Vacuum drops superseded files → time travel forfeited, head intact.
    t.vacuum()
    assert _rows(t.read(spark)) == [("d1", "a", 2)]


def test_empty_table_reads_empty_with_schema(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    pruned = t.read(spark, partition_values=["nope"])
    assert pruned.count() == 0
    assert set(pruned.columns) == {"date", "k", "v"}  # schema from the log


def test_commit_race_loser_retries(spark, tmp_path):
    """Two writers racing for the same version: the loser must re-read the log
    and land on the next version, with both commits applied."""
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    # Steal the next version number before the writer commits, simulating a
    # concurrent winner.
    real_try = t._try_commit
    stolen = {"done": False}

    def steal_once(version, commit):
        if not stolen["done"]:
            stolen["done"] = True
            real_try(version, {"add": [], "remove": []})  # rival empty commit
        return real_try(version, commit)

    t._try_commit = steal_once
    t.merge_overwrite_partitions(_df(spark, [("d2", "b", 2)]), "date")
    t._try_commit = real_try
    assert _rows(t.read(spark)) == [("d1", "a", 1), ("d2", "b", 2)]
    assert t.snapshot().version == 2  # v0 initial, v1 rival, v2 retried merge


def test_compact_merges_small_files_preserving_data(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    # A 3-task write produces multiple files inside the d1 partition.
    rows = [("d1", k, i) for i, k in enumerate("abcdef")] + [("d2", "x", 9)]
    t.merge_overwrite_partitions(_df(spark, rows).repartition(3), "date")
    before = _rows(t.read(spark))
    files_d1 = [rel for rel, pv in t.snapshot().files.items() if pv == "d1"]
    assert len(files_d1) > 1  # the small-files problem, reproduced
    n_files_before = len(t.snapshot().files)

    replaced = t.compact(spark)
    after_snap = t.snapshot()
    assert _rows(t.read(spark)) == before  # bit-identical data
    # Every multi-file partition collapsed to one file.
    per_part: dict = {}
    for rel, pv in after_snap.files.items():
        per_part.setdefault(pv, []).append(rel)
    assert all(len(v) == 1 for v in per_part.values())
    if replaced:
        assert len(after_snap.files) < n_files_before or replaced > 0
    # Idempotent: nothing left to compact.
    assert t.compact(spark) == 0
    # Time travel still works pre-compaction; vacuum then forfeits it.
    assert _rows(t.read(spark, version=after_snap.version - 1)) == before
    t.vacuum()
    assert _rows(t.read(spark)) == before


def test_generated_at_column_roundtrip(spark, tmp_path):
    """The Gold usage pattern: extra metadata columns survive the layer."""
    t = TxnTable(str(tmp_path / "t"))
    df = _df(spark, [("d1", "a", 1)]).withColumn("generated_at", F.lit("r1"))
    t.merge_overwrite_partitions(df, "date")
    assert t.read(spark).select("generated_at").first()[0] == "r1"
