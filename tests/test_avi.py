"""RIFF/AVI container (operators/avi.py): DIB lossless roundtrip, MJPEG
structure + dHash fidelity, RIFF grammar edge cases (rec-lists, word
alignment, malformed streams), and Spark parity with the synthetic
container path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.avi import (
    avi_keyframe_dhash,
    avi_video_structure,
    attach_fake_avi_payloads,
    decode_avi,
    encode_avi,
)
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_frame_pixels,
    dhash64,
)


def _frames(doc_id: int) -> list[np.ndarray]:
    return [_textured_frame_pixels(doc_id, f) for f in range(4 + doc_id % 5)]


@pytest.mark.parametrize("doc_id", [0, 3, 17, 42])
def test_dib_roundtrip_is_bit_exact(doc_id):
    frames = _frames(doc_id)
    out = decode_avi(encode_avi(frames, codec="DIB "))
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_mjpeg_structure_exact_and_dhash_close():
    """MJPEG is lossy, and the mod-250 texture wraps are sharp edges that
    ring at q=90 (px moves up to ~±20 there), so some gradient signs near
    the threshold DO flip — measured worst 7/64 bits across this sweep.
    Honest bound: ≤8 bits (the catalog near-dup radius), with frame
    count/geometry byte-exact — which is exactly why the registry oracle
    for this leg is structural, never pixel-valued."""
    for doc_id in range(12):
        frames = _frames(doc_id)
        out = decode_avi(encode_avi(frames, codec="MJPG"))
        assert [f.shape for f in out] == [f.shape for f in frames]
        for a, b in zip(frames, out):
            assert bin(dhash64(a) ^ dhash64(b)).count("1") <= 8


def test_rec_list_frame_grouping_parses():
    """Real muxers group interleaved frames under LIST 'rec ' — wrap every
    movi chunk in one and the demux must still find them."""
    frames = _frames(5)
    blob = bytearray(encode_avi(frames, codec="DIB "))
    # Rebuild: extract each 00db chunk from movi and wrap in LIST rec .
    movi_at = bytes(blob).find(b"LIST", 100)
    while bytes(blob)[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = bytes(blob).find(b"LIST", movi_at + 1)
    (movi_size,) = struct.unpack_from("<I", blob, movi_at + 4)
    movi_body = bytes(blob[movi_at + 12 : movi_at + 8 + movi_size])
    wrapped = bytearray()
    pos = 0
    while pos + 8 <= len(movi_body):
        (sz,) = struct.unpack_from("<I", movi_body, pos + 4)
        chunk = movi_body[pos : pos + 8 + sz + (sz & 1)]
        wrapped += b"LIST" + struct.pack("<I", 4 + len(chunk)) + b"rec " + chunk
        pos += 8 + sz + (sz & 1)
    new_movi = b"LIST" + struct.pack("<I", 4 + len(wrapped)) + b"movi" + bytes(wrapped)
    rebuilt = bytes(blob[:movi_at]) + new_movi + bytes(blob[movi_at + 8 + movi_size :])
    delta = len(new_movi) - (8 + movi_size)
    rebuilt = (
        b"RIFF"
        + struct.pack("<I", struct.unpack_from("<I", rebuilt, 4)[0] + delta)
        + rebuilt[8:]
    )
    out = decode_avi(rebuilt)
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_word_alignment_odd_jpeg_bodies():
    """Find a quality whose JPEG bodies come out odd-length — the pad byte
    must be skipped, not parsed as the next chunk id."""
    from data_lake_medallion_architecture_project_spark.operators.jpeg import (
        encode_jpeg,
    )

    frames = _frames(7)
    odd_q = next(
        q for q in range(60, 100)
        if any(len(encode_jpeg(f, quality=q, subsampling="4:2:0")) & 1
               for f in frames)
    )
    out = decode_avi(encode_avi(frames, codec="MJPG", quality=odd_q))
    assert len(out) == len(frames)


def test_malformed_streams_fail_loudly():
    frames = _frames(3)
    blob = encode_avi(frames, codec="DIB ")
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="RIFF size runs past"):
        decode_avi(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="no video frames"):
        decode_avi(_headers_only(blob))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi([])
    with pytest.raises(ValueError, match="one geometry"):
        encode_avi([frames[0], np.zeros((4, 4, 3), np.uint8)])
    with pytest.raises(ValueError, match="codec"):
        encode_avi(frames, codec="XVID")


def _headers_only(blob: bytes) -> bytes:
    """The blob with an EMPTY movi list (headers intact, zero frames)."""
    movi_at = blob.find(b"LIST", 100)
    while blob[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = blob.find(b"LIST", movi_at + 1)
    (movi_size,) = struct.unpack_from("<I", blob, movi_at + 4)
    empty = b"LIST" + struct.pack("<I", 4) + b"movi"
    out = blob[:movi_at] + empty + blob[movi_at + 8 + movi_size :]
    delta = len(empty) - (8 + movi_size)
    return (
        b"RIFF"
        + struct.pack("<I", struct.unpack_from("<I", out, 4)[0] + delta)
        + out[8:]
    )


def test_unknown_compression_needs_external_decoder():
    """A '00dc' stream whose strf advertises a codec we don't carry must
    raise the loud install hint, not decode garbage."""
    frames = _frames(3)
    blob = bytearray(encode_avi(frames, codec="MJPG"))
    i = bytes(blob).find(b"MJPG")  # strh fccHandler
    j = bytes(blob).find(b"MJPG", i + 4)  # strf biCompression
    blob[j : j + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="PyAV/ffmpeg"):
        decode_avi(bytes(blob))


def test_frame_before_strf_is_malformed_for_both_codecs():
    """A frame chunk arriving before the strf header is a MALFORMED file
    and must raise ValueError (quarantine class) for '00dc' exactly like
    '00db' — not NotImplementedError (external-decoder class), which
    would mis-route corrupt blobs past a quarantine split keyed on
    error type."""
    for codec, tag in ((b"MJPG", b"00dc"), (b"DIB ", b"00db")):
        frame = _chunk(tag, b"\x00" * 16)
        movi = _list(b"movi", frame)
        body = b"AVI " + movi
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="before the strf"):
            decode_avi(blob)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _list(list_type: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + list_type + body


def test_spark_avi_dib_matches_synthetic_container(spark):
    """The real-container path must produce EXACTLY the hash rows of the
    synthetic container over the same ids — same frames, same stride, only
    the container grammar differs."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_fake_video_payloads,
        video_keyframe_dhash,
    )

    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    avi_rows = sorted(
        tuple(r)
        for r in avi_keyframe_dhash(
            attach_fake_avi_payloads(docs, codec="DIB "), stride=2
        ).collect()
    )
    syn_rows = sorted(
        tuple(r)
        for r in video_keyframe_dhash(
            attach_fake_video_payloads(docs), stride=2
        ).collect()
    )
    assert avi_rows == syn_rows and len(avi_rows) > 0


def test_spark_mjpeg_structure(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = {
        r["doc_id"]: (r["n_frames"], r["img_width"], r["img_height"])
        for r in avi_video_structure(
            attach_fake_avi_payloads(docs, codec="MJPG")
        ).collect()
    }
    for i in range(20):
        assert out[i] == (4 + i % 5, 16 + i % 13, 2 * (8 + i % 11))
