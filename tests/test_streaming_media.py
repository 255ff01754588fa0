"""Streaming media-intake door (streaming/media_ingest.py): exactly-once
image ingest, decode quarantine, within-batch perceptual collapse,
cross-batch near-dup screening, and crash-replay idempotency."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_pixels,
    dhash64,
    encode_bmp,
    encode_png,
)
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.media_ingest import (
    media_batch_against_table,
    media_dhash_with_quarantine,
    run_media_ingest,
)


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _group_rows(start_id, group, fmt=encode_bmp):
    """``group`` ids rendering the SAME textured image up to the one-pixel
    perturbation (doc_id DIV group keys the pixels) — the planted near-dup
    population the catalog queries use (Hamming ≤ 1 within a group)."""
    return [
        (i, bytearray(fmt(_textured_pixels(i, group))))
        for i in range(start_id, start_id + group)
    ]


def test_quarantine_split_hashes_good_and_flags_bad(spark):
    good = _group_rows(0, 1)[0]
    corrupt_png = bytearray(encode_png(_textured_pixels(3, 1)))
    corrupt_png[-5] ^= 0xFF  # break the IEND CRC → ValueError at parse
    rows = [
        good,
        (1, corrupt_png),
        (2, bytearray(b"II*\x00" + b"\x00" * 16)),  # TIFF: no codec → loud
    ]
    out = {
        r["doc_id"]: (r["dhash"], r["decode_error"])
        for r in media_dhash_with_quarantine(_payload_df(spark, rows)).collect()
    }
    assert out[0][1] is None
    assert out[0][0] == np.int64(np.uint64(dhash64(_textured_pixels(0, 1))))
    assert out[1][0] is None and "ValueError" in out[1][1]
    assert out[2][0] is None and "NotImplementedError" in out[2][1]


def test_door_end_to_end_dedups_and_quarantines(spark, tmp_path):
    """Two file-batches through the real stream: batch 2 re-sends batch-1
    images (different ids, PNG instead of BMP — same pixels), adds a
    near-dup (one-pixel perturbation), a genuinely new image, and a
    corrupt blob. The corpus must hold exactly the distinct images,
    first-writer id wins, and the corrupt blob must land in quarantine."""
    src = tmp_path / "incoming"
    tbl, idx, quar = (
        str(tmp_path / "media"), str(tmp_path / "index"), str(tmp_path / "quar")
    )
    ckpt = str(tmp_path / "ckpt")

    # batch 1: four distinct images (group=4 with SAME group key gives
    # near-dups; use group=1 distinct ids for distinct images)
    b1 = [(i, bytearray(encode_bmp(_textured_pixels(i, 1)))) for i in range(4)]
    _payload_df(spark, b1).coalesce(1).write.mode("append").parquet(str(src))
    n1 = run_media_ingest(spark, str(src), tbl, idx, quar, ckpt)
    assert n1 >= 1
    t = TxnTable(tbl).read(spark)
    assert t.count() == 4
    first_ids = {r["dhash"]: r["doc_id"] for r in t.collect()}

    # batch 2: ids 100-103 re-encode images 0-3 as PNG (same pixels ⇒ same
    # dHash ⇒ exact screen); id 104 is a one-pixel perturbation of image 0
    # (Hamming ≤ 1 ⇒ near screen); id 105 is new; id 106 is corrupt.
    b2 = [
        (100 + i, bytearray(encode_png(_textured_pixels(i, 1))))
        for i in range(4)
    ]
    px_near = _textured_pixels(0, 1).copy()
    px_near[0, 0] = (px_near[0, 0].astype(int) + 3).astype(np.uint8)
    b2.append((104, bytearray(encode_bmp(px_near))))
    b2.append((105, bytearray(encode_bmp(_textured_pixels(77, 1)))))
    b2.append((106, bytearray(b"JUNKJUNKJUNK")))
    _payload_df(spark, b2).coalesce(1).write.mode("append").parquet(str(src))
    run_media_ingest(spark, str(src), tbl, idx, quar, ckpt)

    t2 = TxnTable(tbl).read(spark)
    rows = {r["doc_id"]: r["dhash"] for r in t2.collect()}
    assert set(rows) == {0, 1, 2, 3, 105}  # first ids won; 105 is new
    for h, i in first_ids.items():
        assert rows[i] == h  # batch-1 winners untouched
    q = TxnTable(quar).read(spark).collect()
    assert {r["doc_id"] for r in q} == {106}
    # unknown magic → the loud install-hint NotImplementedError, recorded
    assert "NotImplementedError" in q[0]["decode_error"]


def test_within_batch_collapse_min_id_wins(spark, tmp_path):
    tbl = TxnTable(str(tmp_path / "m"))
    idx = TxnTable(str(tmp_path / "i"))
    quar = TxnTable(str(tmp_path / "q"))
    px = _textured_pixels(5, 1)
    rows = [(9, bytearray(encode_bmp(px))), (3, bytearray(encode_png(px))),
            (7, bytearray(encode_bmp(px)))]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, rows), "t", 0
    )
    out = tbl.read(spark).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3


def test_crash_replay_is_idempotent(spark, tmp_path):
    """A replayed (app_id, batch_id) must be a no-op on all three tables —
    the marker, not luck, provides exactly-once."""
    tbl = TxnTable(str(tmp_path / "m"))
    idx = TxnTable(str(tmp_path / "i"))
    quar = TxnTable(str(tmp_path / "q"))
    rows = [
        (1, bytearray(encode_bmp(_textured_pixels(1, 1)))),
        (2, bytearray(b"corrupt")),
    ]
    df = _payload_df(spark, rows)
    media_batch_against_table(spark, tbl, idx, quar, df, "app", 7)
    v_tbl, v_idx, v_q = (
        tbl.snapshot().version, idx.snapshot().version, quar.snapshot().version
    )
    media_batch_against_table(spark, tbl, idx, quar, df, "app", 7)  # replay
    assert tbl.snapshot().version == v_tbl
    assert idx.snapshot().version == v_idx
    assert quar.snapshot().version == v_q
    assert tbl.read(spark).count() == 1
    assert quar.read(spark).count() == 1


def test_near_dup_screen_matches_batch_operator_recall(spark, tmp_path):
    """Pigeonhole recall: ingest a corpus batch, then probe with planted
    near-dups (group=4 population) — EVERY within-radius probe must be
    screened out, matching image_near_dup_pairs' guarantee."""
    tbl = TxnTable(str(tmp_path / "m"))
    idx = TxnTable(str(tmp_path / "i"))
    quar = TxnTable(str(tmp_path / "q"))
    # corpus: the group representatives (ids ≡ 0 mod 4 render the base image)
    base = [(g * 4, bytearray(encode_bmp(_textured_pixels(g * 4, 4))))
            for g in range(6)]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, base), "a", 0
    )
    # probes: the other group members (Hamming ≤ 1 from their rep)
    probes = [
        (g * 4 + m, bytearray(encode_bmp(_textured_pixels(g * 4 + m, 4))))
        for g in range(6)
        for m in (1, 2, 3)
    ]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, probes), "a", 1
    )
    assert tbl.read(spark).count() == 6  # no probe survived the screen
