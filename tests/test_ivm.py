"""Tests for storage/ivm.py — CDF-driven incremental aggregate maintenance."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.storage.ivm import maintain_sum_view


def _df(spark, rows):
    return spark.createDataFrame(rows, "date string, k string, v long")


def _view_rows(spark, view):
    return {
        r["group"]: (r["total"], r["n_rows"])
        for r in view.read(spark).collect()
    }


def _truth(spark, src):
    got = {}
    for r in src.read(spark).collect():
        t, n = got.get(r["date"], (0, 0))
        got[r["date"]] = (t + r["v"], n + 1)
    return got


def test_view_tracks_inserts_updates_deletes(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    args = (src, view, spark, ["k"], "date", "v")

    src.merge_overwrite_partitions(
        _df(spark, [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3)]), "date"
    )
    assert maintain_sum_view(*args) == 2  # d1, d2 bootstrapped
    assert _view_rows(spark, view) == _truth(spark, src)

    # Caught up: nothing to do.
    assert maintain_sum_view(*args) == 0

    # Update (delta = new − old), insert, and delete — one maintenance call.
    src.merge_upsert(spark, _df(spark, [("d1", "a", 10), ("d2", "d", 7)]), ["k"])
    src.delete_keys(spark, spark.createDataFrame([("b",)], "k string"), ["k"])
    touched = maintain_sum_view(*args)
    assert touched == 2  # d1 (update+delete), d2 (insert)
    assert _view_rows(spark, view) == _truth(spark, src) == {
        "d1": (10, 1),
        "d2": (10, 2),
    }


def test_replay_after_lost_marker_window_is_exact(spark, tmp_path):
    """The crash shape that motivates marker-as-cursor: apply lands, then
    MORE source commits arrive, then maintenance runs again. The feed range
    derives from the view's own txn marker (committed atomically with the
    data), so the already-applied range can never be re-counted."""
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    args = (src, view, spark, ["k"], "date", "v")
    src.merge_overwrite_partitions(_df(spark, [("d1", "a", 1)]), "date")
    maintain_sum_view(*args)
    src.merge_upsert(spark, _df(spark, [("d1", "b", 2)]), ["k"])
    src.merge_upsert(spark, _df(spark, [("d1", "c", 4)]), ["k"])
    maintain_sum_view(*args)
    assert _view_rows(spark, view) == {"d1": (7, 3)}
    # Idempotent under arbitrary re-runs.
    maintain_sum_view(*args)
    maintain_sum_view(*args)
    assert _view_rows(spark, view) == _truth(spark, src) == {"d1": (7, 3)}


def test_noop_update_and_compaction_touch_nothing(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    args = (src, view, spark, ["k"], "date", "v")
    src.merge_overwrite_partitions(_df(spark, [("d1", "a", 5), ("d1", "b", 1)]), "date")
    maintain_sum_view(*args)
    v_before = view.snapshot().version
    # Same-value rewrite: pre/post cancel. Compaction: bytes move, no rows.
    src.merge_upsert(spark, _df(spark, [("d1", "a", 5)]), ["k"])
    src.compact(spark)
    assert maintain_sum_view(*args) == 0
    assert view.snapshot().version == v_before
    assert _view_rows(spark, view) == {"d1": (6, 2)}
