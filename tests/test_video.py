"""Video container + keyframe-dHash path: codec roundtrip, error handling,
frame sampling, and numpy parity of the per-frame hashes."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_frame_pixels,
    attach_fake_video_payloads,
    decode_video,
    dhash64,
    encode_bmp,
    encode_video,
    video_keyframe_dhash,
)


def test_video_container_roundtrip():
    frames = [b"alpha", b"", b"\x00" * 7, encode_bmp(_textured_frame_pixels(3, 1))]
    assert decode_video(encode_video(frames)) == frames
    assert decode_video(encode_video([])) == []


def test_video_container_rejects_corruption():
    payload = encode_video([b"abc", b"defg"])
    with pytest.raises(ValueError, match="magic"):
        decode_video(b"XXXX" + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_video(payload[:-2])
    with pytest.raises(ValueError, match="trailing"):
        decode_video(payload + b"!")


def test_keyframe_dhash_matches_numpy(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = video_keyframe_dhash(attach_fake_video_payloads(docs), stride=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["dhash"] for r in out}
    expected = {}
    for d in range(12):
        n = 4 + d % 5
        for f in range(0, n, 2):
            expected[(d, f)] = np.int64(
                np.uint64(dhash64(_textured_frame_pixels(d, f)))
            )
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == expected[k]


def test_frame_evolution_changes_hash():
    """The f-dependent gradient term must actually move dHash bits between
    frames (a constant brightness shift would not)."""
    changed = 0
    for d in range(8):
        h0 = dhash64(_textured_frame_pixels(d, 0))
        h1 = dhash64(_textured_frame_pixels(d, 3))
        changed += h0 != h1
    assert changed >= 6


def test_video_near_dup_recovers_planted_groups(spark):
    """group=4 plants near-dup quadruples: every within-group pair must be
    recovered with n_close_frames = all sampled frames, and no cross-group
    pair may appear."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    docs = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    hashes = video_keyframe_dhash(
        attach_fake_video_payloads(docs, group=4), stride=2
    )
    pairs = {
        (r["a_id"], r["b_id"]): r["n_close_frames"]
        for r in video_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    expected_pairs = {
        (a, b)
        for g in range(4)
        for a in range(g * 4, g * 4 + 4)
        for b in range(a + 1, g * 4 + 4)
    }
    assert set(pairs) == expected_pairs
    for (a, b), n in pairs.items():
        g = a // 4
        n_frames = 4 + g % 5
        n_sampled = len(range(0, n_frames, 2))
        assert n == n_sampled
