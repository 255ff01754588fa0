"""Streaming WARC-intake door (streaming/warc_ingest.py): exactly-once
crawl-blob ingest, blob-level quarantine for corrupt archives, the
dedup-door handoff (within-batch + cross-batch content dedup), and
crash-replay idempotency."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.sources.warc import (
    build_warc_blob,
)
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.warc_ingest import (
    run_warc_ingest,
    warc_batch_against_table,
    warc_records_with_quarantine,
)


def _blob_df(spark, rows):
    return spark.createDataFrame(rows, "blob_id long, blob binary")


def test_parse_stage_splits_good_records_and_quarantines_bad(spark):
    good = build_warc_blob([(1, "alpha"), (2, "beta")])
    corrupt = build_warc_blob([(3, "gamma")])[:-10]  # truncated member
    out = warc_records_with_quarantine(
        _blob_df(spark, [(0, bytearray(good)), (1, bytearray(corrupt))])
    ).collect()
    recs = [r for r in out if r["parse_error"] is None]
    quar = [r for r in out if r["parse_error"] is not None]
    assert sorted(r["text"] for r in recs) == ["alpha", "beta"]
    assert all(r["blob_id"] == 0 and r["warc_type"] == "conversion"
               for r in recs)
    assert len(quar) == 1 and quar[0]["blob_id"] == 1
    assert "truncated gzip member" in quar[0]["parse_error"]


def test_quarantine_is_all_or_nothing_per_blob(spark):
    """A corrupt member invalidates the whole archive's framing: records
    BEFORE it must not leak into the corpus either."""
    blob = build_warc_blob([(1, "early"), (2, "late")])
    corrupt = bytearray(blob)
    corrupt[-12] ^= 0xFF  # damage the LAST member's tail (CRC region)
    out = warc_records_with_quarantine(
        _blob_df(spark, [(0, corrupt)])
    ).collect()
    assert len(out) == 1 and out[0]["parse_error"] is not None
    assert out[0]["text"] is None  # 'early' did not survive


def test_warc_door_end_to_end(spark, tmp_path):
    """Two file-batches through the real stream: within-blob duplicate
    text collapses, a cross-batch duplicate is screened by the corpus
    anti-join, a new document lands, and the corrupt blob quarantines —
    all under the file-source checkpoint."""
    src = tmp_path / "incoming"
    tbl, quar = str(tmp_path / "docs"), str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")

    b1 = build_warc_blob([(1, "alpha"), (2, "beta"), (3, "alpha")])
    _blob_df(spark, [(0, bytearray(b1))]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    n1 = run_warc_ingest(spark, str(src), tbl, quar, ckpt)
    assert n1 >= 1
    t = TxnTable(tbl).read(spark)
    assert sorted(r["text"] for r in t.collect()) == ["alpha", "beta"]

    b2 = build_warc_blob([(4, "beta"), (5, "gamma")])
    bad = build_warc_blob([(6, "delta")])[:-10]
    _blob_df(
        spark, [(10, bytearray(b2)), (11, bytearray(bad))]
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_warc_ingest(spark, str(src), tbl, quar, ckpt)

    t2 = TxnTable(tbl).read(spark)
    assert sorted(r["text"] for r in t2.collect()) == [
        "alpha", "beta", "gamma"
    ]
    # 'delta' never landed: its blob quarantined whole
    q = TxnTable(quar).read(spark).collect()
    assert [r["blob_id"] for r in q] == [11]
    assert "ValueError" in q[0]["parse_error"]


def test_warc_crash_replay_is_idempotent(spark, tmp_path):
    """A replayed (app_id, batch_id) must be a no-op on both tables."""
    tbl = TxnTable(str(tmp_path / "docs"))
    quar = TxnTable(str(tmp_path / "quar"))
    rows = [
        (0, bytearray(build_warc_blob([(1, "alpha")]))),
        (1, bytearray(build_warc_blob([(2, "beta")])[:-10])),
    ]
    df = _blob_df(spark, rows)
    warc_batch_against_table(spark, tbl, quar, df, "app", 3)
    v_t, v_q = tbl.snapshot().version, quar.snapshot().version
    warc_batch_against_table(spark, tbl, quar, df, "app", 3)  # replay
    assert tbl.snapshot().version == v_t
    assert quar.snapshot().version == v_q
    assert tbl.read(spark).count() == 1
    assert quar.read(spark).count() == 1


def test_zero_record_blob_is_quarantined_not_lost(spark):
    """Round-15 review finding: a blob parsing to ZERO records (empty /
    whitespace-only) previously vanished from both tables; every
    blob_id must land in exactly one disposition."""
    rows = [(0, bytearray(b"")), (1, bytearray(b"\r\n\r\n")),
            (2, bytearray(build_warc_blob([(9, "real")])))]
    out = warc_records_with_quarantine(_blob_df(spark, rows)).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert set(by_blob) == {0, 1, 2}
    for empty_id in (0, 1):
        (row,) = by_blob[empty_id]
        assert "zero records" in row["parse_error"]
    assert by_blob[2][0]["parse_error"] is None
