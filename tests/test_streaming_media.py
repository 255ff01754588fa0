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


def test_within_batch_near_dups_collapse_to_one(spark, tmp_path):
    """Round-15 (r14 verdict/ADVICE): two Hamming-≤3 variants arriving in
    the SAME micro-batch must commit exactly one survivor (min id), the
    same outcome one-image-per-batch sequencing would produce — the
    exact-hash collapse alone cannot see them."""
    tbl = TxnTable(str(tmp_path / "m"))
    idx = TxnTable(str(tmp_path / "i"))
    quar = TxnTable(str(tmp_path / "q"))
    # group=4: ids 8..11 render the same base image up to a one-pixel
    # perturbation (distinct dHashes at Hamming ≤ 1); one distinct image.
    rows = _group_rows(8, 4) + [(50, bytearray(encode_bmp(_textured_pixels(50, 1))))]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, rows), "wb", 0
    )
    out = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert out == [8, 50]  # min id of the near-dup cluster + the new image
    # the index must hold only survivors: a later batch re-sending a
    # dropped variant's pixels is still screened (by the kept rep)
    replay = [(200, bytearray(encode_bmp(_textured_pixels(9, 4))))]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, replay), "wb", 1
    )
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [8, 50]


def test_within_batch_collapse_matches_sequential_arrival_on_chains(
    spark, tmp_path
):
    """A chain A~B~C where A and C are farther apart than the radius:
    one-image-per-batch sequencing commits A, drops B (near the kept A),
    then commits C (not near A) — so the within-batch collapse must keep
    BOTH ends, not collapse the component to one survivor (round-15
    review finding: a connected-component pass over-drops C and makes
    the corpus depend on batch boundaries)."""
    tbl = TxnTable(str(tmp_path / "m"))
    idx = TxnTable(str(tmp_path / "i"))
    quar = TxnTable(str(tmp_path / "q"))

    def image_with_bits(flip: int) -> np.ndarray:
        """An 8×9 image (== the dHash thumbnail, no resampling) whose
        first ``flip`` row-0 gradient signs are inverted vs the base —
        exact control of the Hamming distance."""
        px = np.zeros((8, 9), dtype=np.int64)
        for r in range(8):
            v = 128
            px[r, 0] = v
            for c in range(8):
                bit = 1 if not (r == 0 and c < flip) else 0
                v += 8 if bit else -8
                px[r, c + 1] = v
        return np.repeat(px[:, :, None], 3, axis=2).astype(np.uint8)

    hs = [dhash64(image_with_bits(k)) for k in (0, 2, 4)]
    # chain sanity: A~B and B~C within the radius, A..C beyond it
    assert bin(hs[0] ^ hs[1]).count("1") == 2
    assert bin(hs[1] ^ hs[2]).count("1") == 2
    assert bin(hs[0] ^ hs[2]).count("1") == 4
    rows = [
        (31, bytearray(encode_bmp(image_with_bits(0)))),
        (32, bytearray(encode_bmp(image_with_bits(2)))),
        (33, bytearray(encode_bmp(image_with_bits(4)))),
    ]
    media_batch_against_table(
        spark, tbl, idx, quar, _payload_df(spark, rows), "ch", 0
    )
    out = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert out == [31, 33]  # both chain ends survive; only B drops
    # and the SAME images split across two batches commit the same set
    tbl2 = TxnTable(str(tmp_path / "m2"))
    idx2 = TxnTable(str(tmp_path / "i2"))
    quar2 = TxnTable(str(tmp_path / "q2"))
    media_batch_against_table(
        spark, tbl2, idx2, quar2, _payload_df(spark, rows[:2]), "ch2", 0
    )
    media_batch_against_table(
        spark, tbl2, idx2, quar2, _payload_df(spark, rows[2:]), "ch2", 1
    )
    out2 = sorted(r["doc_id"] for r in tbl2.read(spark).collect())
    assert out2 == [31, 33]  # batch boundaries don't change the corpus


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
