"""Pure-stdlib baseline JPEG codec (operators/jpeg.py): roundtrip fidelity
across layouts (4:4:4 / 4:2:0, restart intervals), published-table spot
checks, the grayscale decode path, dispatch through decode_image, and
format-agnostic dHash integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.jpeg import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _DCT,
    _ZZ_FLAT,
    _build_decode_table,
    _build_encode_table,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            np.clip(xx * 4, 0, 255),
            np.clip(yy * 5, 0, 255),
            np.clip((xx + yy) * 2, 0, 255),
        ]
    ).astype(np.uint8)


# --------------------------------------------------------------------------- #
# Roundtrip fidelity — the codec pair proves the entropy/DCT plumbing.
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_roundtrip_all_layouts(subsampling, restart_interval):
    """Gradient content roundtrips within JPEG-typical error at q=90 in
    all four layout combinations, including non-multiple-of-16 dims (the
    pad/crop path)."""
    img = _gradient(37, 53)
    payload = encode_jpeg(
        img, quality=90, subsampling=subsampling,
        restart_interval=restart_interval,
    )
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    out = decode_jpeg(payload)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.5, (subsampling, restart_interval, err.mean())
    assert err.max() <= 16, (subsampling, restart_interval, err.max())


def test_solid_color_roundtrips_exactly():
    """A solid-color image is DC-only; quantized DC at q=90 reconstructs
    the exact pixel value (the quant table's DC entry divides cleanly
    after rounding)."""
    solid = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=90))
    assert int(np.abs(out.astype(int) - solid.astype(int)).max()) <= 1


def test_restart_markers_present_and_reset():
    """restart_interval writes a DRI segment and RSTn markers into the
    stream, and the decode result is identical to the no-restart encode
    (restarts change framing, not content)."""
    img = _gradient(48, 48)
    plain = encode_jpeg(img, quality=85)
    rst = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_chroma_subsampling_shrinks_payload():
    """4:2:0 carries a quarter of the chroma blocks — the payload must be
    smaller on chroma-rich content, and still decode close to the
    original (box-averaged chroma)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    p444 = encode_jpeg(img, quality=90, subsampling="4:4:4")
    p420 = encode_jpeg(img, quality=90, subsampling="4:2:0")
    assert len(p420) < len(p444)
    out = decode_jpeg(p420)
    assert out.shape == img.shape


# --------------------------------------------------------------------------- #
# Published-fact spot checks — catch transcription errors the symmetric
# roundtrip cannot (encoder and decoder share the table constants).
# --------------------------------------------------------------------------- #


def test_dc_luma_canonical_codes_match_spec():
    """The Annex K DC-luminance table's canonical codes are published:
    category 0 → '00' (2 bits), 5 → '110' (3 bits), 11 → 9 bits of 1s
    then 0. A transcription error in BITS shifts these."""
    enc = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    assert enc[0] == (2, 0b00)
    assert enc[1] == (3, 0b010)
    assert enc[5] == (3, 0b110)
    assert enc[11] == (9, 0b111111110)


def test_ac_luma_eob_and_zrl_codes_match_spec():
    """Published Annex K AC-luminance codes: EOB (0x00) = '1010' (4 bits),
    ZRL (0xF0) = '11111111001' (11 bits), (0,1) = '00' (2 bits)."""
    enc = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    assert enc[0x00] == (4, 0b1010)
    assert enc[0xF0] == (11, 0b11111111001)
    assert enc[0x01] == (2, 0b00)
    # Decode table is the exact inverse.
    dec = _build_decode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    assert dec[(4, 0b1010)] == 0x00 and dec[(11, 0b11111111001)] == 0xF0


def test_zigzag_matches_published_order():
    """First and last entries of the published zigzag scan: 0,1,8,16,9,2
    ... 55,62,63 in row-major flat indexing."""
    assert list(_ZZ_FLAT[:6]) == [0, 1, 8, 16, 9, 2]
    assert list(_ZZ_FLAT[-3:]) == [55, 62, 63]


def test_dct_matrix_is_orthonormal():
    """The shared DCT basis must satisfy C @ C.T = I (the forward/inverse
    pair is exact up to float error — fidelity loss comes only from
    quantization)."""
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(3)
    block = rng.normal(size=(8, 8))
    f = _DCT @ block @ _DCT.T
    assert np.allclose(_DCT.T @ f @ _DCT, block, atol=1e-10)


# --------------------------------------------------------------------------- #
# Grayscale, unsupported flavors, malformed streams.
# --------------------------------------------------------------------------- #


def _grayscale_jpeg(plane: np.ndarray, quality: int = 90) -> bytes:
    """Hand-assemble a 1-component baseline JPEG from the module's
    primitives (the encoder always writes 3 components, so the grayscale
    DECODE path needs its own vector)."""
    from data_lake_medallion_architecture_project_spark.operators.jpeg import (
        _BitWriter,
        _encode_block,
        _pad_plane,
        _quality_scale,
        _QT_LUMA,
    )

    h, w = plane.shape
    qt = _quality_scale(_QT_LUMA, quality)
    pp = _pad_plane(plane.astype(np.float64), 8) - 128.0
    bw = _BitWriter()
    dc = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    pred = 0
    for by in range(pp.shape[0] // 8):
        for bx in range(pp.shape[1] // 8):
            block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = np.round((_DCT @ block @ _DCT.T) / qt).astype(np.int64)
            pred = _encode_block(bw, coef, pred, dc, ac)
    bw.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz = qt.reshape(-1)[_ZZ_FLAT]
    return (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes(int(x) for x in zz))
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_grayscale_stream_replicates_to_rgb():
    plane = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (24, 1))
    out = decode_jpeg(_grayscale_jpeg(plane))
    assert out.shape == (24, 24, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    assert np.abs(out[:, :, 0].astype(int) - plane.astype(int)).mean() < 3


def test_progressive_marker_raises_not_implemented():
    """A SOF2 (progressive) marker must fail loudly toward the pillow
    dispatch, not mis-decode."""
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img))
    idx = bytes(payload).index(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_jpeg(bytes(payload))


def test_truncated_stream_fails_loudly():
    img = _gradient(16, 16)
    payload = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # zero-length segment


# --------------------------------------------------------------------------- #
# Integration: decode_image dispatch + format-agnostic dHash.
# --------------------------------------------------------------------------- #


def test_decode_image_dispatches_baseline_jpeg():
    from data_lake_medallion_architecture_project_spark.operators.multimodal import decode_image

    img = _gradient(32, 32)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0


def test_image_dhash_stable_across_bmp_and_jpeg(spark):
    """dHash works over 9×8 box averages, so high-quality JPEG's ±few-LSB
    reconstruction error must leave the hash within a small hamming
    distance of the lossless BMP hash on gradient-structured content —
    the format-agnosticity contract for lossy members of the catalog."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
    )

    images = [
        np.clip(_gradient(24, 32).astype(int) + 17 * i, 0, 255).astype(np.uint8)
        for i in range(4)
    ]
    bmp_rows = [(i, bytearray(encode_bmp(px))) for i, px in enumerate(images)]
    jpg_rows = [
        (i, bytearray(encode_jpeg(px, quality=95))) for i, px in enumerate(images)
    ]
    schema = "doc_id long, payload binary"
    bmp = {
        r["doc_id"]: int(r["dhash"])
        for r in image_dhash(spark.createDataFrame(bmp_rows, schema)).collect()
    }
    jpg = {
        r["doc_id"]: int(r["dhash"])
        for r in image_dhash(spark.createDataFrame(jpg_rows, schema)).collect()
    }
    for i in bmp:
        assert bin(bmp[i] ^ jpg[i]).count("1") <= 6, i


def test_multiscan_baseline_raises_not_implemented():
    """Baseline multi-scan (one scan per component) is legal SOF0; decoding
    only the first scan would silently zero the other planes. The decoder
    must refuse loudly so dispatch falls through to pillow."""
    import numpy as np
    import pytest

    px = np.full((8, 8, 3), 128, dtype=np.uint8)
    buf = encode_jpeg(px)
    i = buf.find(b"\xff\xda")
    seglen = int.from_bytes(buf[i + 2 : i + 4], "big")
    body = buf[i + 4 : i + 2 + seglen]
    assert body[0] == 3  # interleaved 3-component scan as written
    # Rewrite the SOS to claim a single-component scan (first scan of a
    # non-interleaved stream); entropy bytes after it are untouched.
    new_body = bytes([1]) + body[1:3] + body[1 + 2 * 3 :]
    new_seg = (
        b"\xff\xda" + (2 + len(new_body)).to_bytes(2, "big") + new_body
    )
    hacked = buf[:i] + new_seg + buf[i + 2 + seglen :]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(hacked)
