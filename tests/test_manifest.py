"""Tests for storage/manifest.py — external engines (DuckDB) reading a
pinned, consistent snapshot of the transactional table."""

from __future__ import annotations

import os

import duckdb

from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.storage.manifest import (
    read_manifest_paths,
    write_symlink_manifest,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "date string, k string, v long")


def _duck_rows(paths):
    if not paths:
        return []
    rel = duckdb.sql(
        "SELECT date, k, v FROM read_parquet($paths) ORDER BY date, k",
        params={"paths": paths},
    )
    return [tuple(r) for r in rel.fetchall()]


def test_duckdb_reads_exactly_the_committed_snapshot(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1), ("d2", "b", 2)]), "date")
    t.merge_upsert(spark, _df(spark, [("d1", "a", 10)]), keys=["k"])
    # Orphan garbage in _data/ must be invisible to manifest readers.
    _df(spark, [("d9", "junk", 99)]).write.parquet(
        os.path.join(t.data_dir, "orphan_crash")
    )
    root = write_symlink_manifest(t)
    got = _duck_rows(read_manifest_paths(root))
    want = sorted(
        map(tuple, t.read(spark).select("date", "k", "v").collect())
    )
    assert got == want
    assert ("d9", "junk", 99) not in got


def test_manifest_pins_its_snapshot_across_later_commits(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    root = write_symlink_manifest(t)
    before = _duck_rows(read_manifest_paths(root))
    # Concurrent writers move the table on; the published manifest must keep
    # serving the old consistent view until regenerated.
    t.merge_upsert(spark, _df(spark, [("d1", "a", 2), ("d2", "b", 3)]), keys=["k"])
    assert _duck_rows(read_manifest_paths(root)) == before
    write_symlink_manifest(t)  # regenerate → new snapshot published
    assert _duck_rows(read_manifest_paths(root)) == sorted(
        map(tuple, t.read(spark).select("date", "k", "v").collect())
    )


def test_manifest_layout_is_partitioned(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1), ("d2", "b", 2)]), "date")
    root = write_symlink_manifest(t)
    assert sorted(os.listdir(root)) == ["date=d1", "date=d2"]
    # Time travel: a manifest for an old version lists the old files.
    v0 = 0
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 100)]), "date")
    old_root = write_symlink_manifest(t, version=v0)
    assert ("d1", "a", 1) in _duck_rows(read_manifest_paths(old_root))


def test_manifest_refuses_live_deletion_vectors(spark, tmp_path):
    import pytest

    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1), ("d1", "b", 2)]), "date")
    t.delete_keys_dv(spark, spark.createDataFrame([("a",)], "k string"), ["k"])
    # A bare file list would resurrect the deleted row for external readers.
    with pytest.raises(ValueError, match="deletion vectors"):
        write_symlink_manifest(t)
    # Compaction folds the DV in; the manifest then serves the true rows.
    t.compact(spark)
    root = write_symlink_manifest(t)
    assert _duck_rows(read_manifest_paths(root)) == [("d1", "b", 2)]
