"""Tests for storage/cdf.py — the reconstructed Change Data Feed."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.storage.cdf import table_changes


def _df(spark, rows):
    return spark.createDataFrame(rows, "date string, k string, v long")


def _feed(t, spark, frm, to=None):
    return sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in table_changes(t, spark, ["k"], frm, to).collect()
    )


def test_insert_update_delete_classified(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1), ("d1", "b", 2)]), "date")
    v0 = t.snapshot().version
    t.merge_upsert(spark, _df(spark, [("d1", "a", 10), ("d2", "c", 3)]), keys=["k"])
    t.delete_keys(spark, spark.createDataFrame([("b",)], "k string"), keys=["k"])
    assert _feed(t, spark, v0) == [
        ("delete", "b", 2),
        ("insert", "c", 3),
        ("update_postimage", "a", 10),
        ("update_preimage", "a", 1),
    ]


def test_intermediate_range_and_same_version_empty(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    v0 = t.snapshot().version
    t.merge_upsert(spark, _df(spark, [("d1", "a", 2)]), keys=["k"])
    v1 = t.snapshot().version
    t.merge_upsert(spark, _df(spark, [("d1", "a", 3)]), keys=["k"])
    # Range v0→v1 sees only the first update, not the second.
    assert _feed(t, spark, v0, v1) == [
        ("update_postimage", "a", 2),
        ("update_preimage", "a", 1),
    ]
    assert _feed(t, spark, v0, v0) == []


def test_compaction_emits_no_changes(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    t.merge_upsert(spark, _df(spark, [("d1", "b", 2)]), keys=["k"])
    v = t.snapshot().version
    t.compact(spark)  # rewrites files; rows are identical
    assert t.snapshot().version > v
    assert _feed(t, spark, v) == []  # bytes moved, no rows changed


def test_untouched_partitions_not_scanned(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(
        _df(spark, [("d1", "a", 1), ("d2", "b", 2), ("d3", "c", 3)]), "date"
    )
    v0 = t.snapshot().version
    t.merge_upsert(spark, _df(spark, [("d2", "b", 20)]), keys=["k"])
    feed = table_changes(t, spark, ["k"], v0)
    # Only d2 changed: the feed's scans must touch only d2's files.
    files = [
        f for f in feed._jdf.queryExecution().optimizedPlan().toString().split("\n")
        if "parquet" in f.lower()
    ]
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert "d2" in plan or files  # relations exist...
    rows = sorted((r["_change_type"], r["k"]) for r in feed.collect())
    assert rows == [("update_postimage", "b"), ("update_preimage", "b")]
    # File-level assert: every parquet path fed to the scans is a d2 file.
    import re

    paths = re.findall(r"\S*/_data/\S*", plan)
    s1 = t.snapshot()
    d2_files = {f for f, pv in s1.files.items() if pv == "d2"}
    v0_d2 = {f for f, pv in t.snapshot(v0).files.items() if pv == "d2"}
    allowed = {p.split("_data/")[-1].rstrip(",)") for p in paths}
    wanted = {f.split("_data/")[-1] for f in d2_files | v0_d2}
    assert allowed <= wanted or not paths


def test_consume_ack_cursor_loop(spark, tmp_path):
    from data_lake_medallion_architecture_project_spark.storage.cdf import (
        ack_changes,
        consume_changes,
    )

    t = TxnTable(str(tmp_path / "t"))
    cursor = str(tmp_path / "cursor")
    t.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")

    # First consumption: full replay as inserts.
    feed, head = consume_changes(t, spark, ["k"], cursor)
    assert [(r["_change_type"], r["k"]) for r in feed.collect()] == [("insert", "a")]
    # Crash before ack: the same range replays (at-least-once).
    feed2, head2 = consume_changes(t, spark, ["k"], cursor)
    assert head2 == head and feed2.count() == 1
    ack_changes(cursor, head)

    # Caught up: empty feed with the CDF schema.
    feed3, head3 = consume_changes(t, spark, ["k"], cursor)
    assert head3 == head and feed3.count() == 0
    assert "_change_type" in feed3.columns

    # New commits: only the delta flows.
    t.merge_upsert(spark, _df(spark, [("d1", "a", 2), ("d1", "b", 9)]), keys=["k"])
    feed4, head4 = consume_changes(t, spark, ["k"], cursor)
    got = sorted((r["_change_type"], r["k"]) for r in feed4.collect())
    assert got == [
        ("insert", "b"), ("update_postimage", "a"), ("update_preimage", "a"),
    ]
    ack_changes(cursor, head4)
    assert consume_changes(t, spark, ["k"], cursor)[0].count() == 0


def test_dv_only_commit_feeds_deletes(spark, tmp_path):
    """A deletion-vector commit changes no files — the feed must surface its
    row-level deletes through the DV set, not the file diff (which is empty
    for a DV-only range)."""
    t = TxnTable(str(tmp_path / "t"))
    t.merge_overwrite_partitions(
        _df(spark, [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3)]), "date"
    )
    v0 = t.snapshot().version
    t.delete_keys_dv(spark, spark.createDataFrame([("b",)], "k string"), ["k"])
    assert _feed(t, spark, v0) == [("delete", "b", 2)]
    # ...and the IVM view built on the feed tracks the DV delete too.
    from data_lake_medallion_architecture_project_spark.storage.ivm import maintain_sum_view

    view = TxnTable(str(tmp_path / "view"))
    maintain_sum_view(t, view, spark, ["k"], "date", "v")
    got = {r["group"]: (r["total"], r["n_rows"]) for r in view.read(spark).collect()}
    assert got == {"d1": (1, 1), "d2": (3, 1)}
