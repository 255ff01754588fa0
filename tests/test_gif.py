"""Pure-stdlib GIF codec (operators/gif.py): lossless roundtrip across
palette sizes and interlacing, LZW dictionary growth/reset, malformed
streams, decode_image dispatch, and exact dHash parity with BMP."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.gif import (
    decode_gif,
    encode_gif,
)


def _gray_texture(seed: int, h: int = 23, w: int = 31) -> np.ndarray:
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 250, (h, w), dtype=np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_is_bit_exact(interlace):
    img = _gray_texture(4)
    payload = encode_gif(img, interlace=interlace)
    assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(payload), img)


def test_interlaced_and_sequential_decode_identically():
    img = _gray_texture(9, h=37, w=19)  # odd dims stress the 4-pass order
    a = decode_gif(encode_gif(img, interlace=False))
    b = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(a, b) and np.array_equal(a, img)


def test_small_palettes_roundtrip():
    rng = np.random.default_rng(2)
    bw = np.where(rng.random((9, 9, 1)) > 0.5, 255, 0).astype(np.uint8) * np.ones(
        (1, 1, 3), np.uint8
    )
    assert np.array_equal(decode_gif(encode_gif(bw)), bw)
    tri = np.zeros((8, 12, 3), dtype=np.uint8)
    tri[::2, :, 0] = 200
    tri[:, ::3, 2] = 90
    assert np.array_equal(decode_gif(encode_gif(tri)), tri)


def test_lzw_dictionary_growth_and_reset():
    """200x300 noise forces the LZW dictionary past 4096 entries, so the
    encoder must emit CLEAR and rebuild — a bit-exact roundtrip certifies
    both sides of the reset protocol."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 250, (200, 300), dtype=np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_too_many_colors_raises():
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(big)


def test_malformed_streams_fail_loudly():
    img = _gray_texture(6)
    payload = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + payload[6:])
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])  # truncated LZW data
    # A stream whose frame is removed (header + trailer only) has no image.
    hdr_end = 13 + 256 * 3  # screen descriptor + 256-entry palette
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(payload[:hdr_end] + b"\x3b")


def test_extension_blocks_are_skipped():
    """A GCE extension (0x21 0xF9) between the palette and the frame — the
    GIF89a layout real encoders write — must not derail the parser."""
    img = _gray_texture(7)
    payload = encode_gif(img)
    hdr_end = 13 + 256 * 3
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = payload[:hdr_end] + gce + payload[hdr_end:]
    assert np.array_equal(decode_gif(patched), img)


def test_decode_image_dispatches_gif():
    from data_lake_medallion_architecture_project_spark.operators.multimodal import decode_image

    img = _gray_texture(8)
    assert np.array_equal(decode_image(encode_gif(img, interlace=True)), img)


def test_image_dhash_identical_across_bmp_and_gif(spark):
    """GIF is lossless, so unlike the JPEG stability test this is EXACT
    hash equality with the BMP path — the same contract the PNG catalog
    certifies under the driver gate."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
    )

    images = [_gray_texture(20 + i, h=24, w=32) for i in range(6)]
    schema = "doc_id long, payload binary"
    bmp = image_dhash(
        spark.createDataFrame(
            [(i, bytearray(encode_bmp(px))) for i, px in enumerate(images)], schema
        )
    ).collect()
    gif = image_dhash(
        spark.createDataFrame(
            [(i, bytearray(encode_gif(px, interlace=True))) for i, px in enumerate(images)],
            schema,
        )
    ).collect()
    assert {(r["doc_id"], r["dhash"]) for r in bmp} == {
        (r["doc_id"], r["dhash"]) for r in gif
    }


# --------------------------------------------------------------------------- #
# Median-cut quantizer — the truecolor→GIF pre-step
# --------------------------------------------------------------------------- #


def _truecolor(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # Smooth gradients + noise: >256 distinct colors, photo-like locality.
    base = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    px = np.stack(
        [base, base[::-1], np.linspace(0, 255, h)[:, None] * np.ones((1, w))],
        axis=2,
    )
    px = px + rng.normal(0, 12, (h, w, 3))
    return np.clip(px, 0, 255).astype(np.uint8)


def test_quantize_enables_truecolor_gif_roundtrip():
    """The two-step composition: a >256-color image raises in encode_gif,
    but quantize_median_cut brings it in-domain and the quantized pixels
    roundtrip bit-exactly (GIF stays lossless AFTER the lossy reduce)."""
    from data_lake_medallion_architecture_project_spark.operators.gif import (
        quantize_median_cut,
    )

    px = _truecolor(1)
    n_distinct = len(np.unique(px.reshape(-1, 3), axis=0))
    assert n_distinct > 256
    with pytest.raises(ValueError, match="quantize upstream"):
        encode_gif(px)
    q = quantize_median_cut(px)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 256
    assert np.array_equal(decode_gif(encode_gif(q)), q)


def test_quantize_is_identity_within_budget_and_deterministic():
    from data_lake_medallion_architecture_project_spark.operators.gif import (
        quantize_median_cut,
    )

    small = _gray_texture(7)  # ≤250 distinct grays — already in budget
    assert np.array_equal(quantize_median_cut(small), small)
    px = _truecolor(2)
    assert np.array_equal(quantize_median_cut(px), quantize_median_cut(px))
    tiny = quantize_median_cut(px, max_colors=8)
    assert len(np.unique(tiny.reshape(-1, 3), axis=0)) <= 8
    with pytest.raises(ValueError, match="max_colors"):
        quantize_median_cut(px, max_colors=0)


def test_quantize_preserves_dhash_within_bound():
    """Quantization is lossy, but dHash reads 9×8 box-averaged gradient
    SIGNS — a 256-color median-cut palette moves individual pixels by a
    few levels, which rarely flips a sign. Honest bound: ≤8 of 64 bits
    across a seed sweep (near-constant regions sit at the threshold and a
    handful of flips is expected; 8 is also the catalog near-dup radius)."""
    from data_lake_medallion_architecture_project_spark.operators.gif import (
        quantize_median_cut,
    )
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        dhash64,
    )

    for seed in range(10):
        px = _truecolor(seed)
        d = dhash64(px) ^ dhash64(quantize_median_cut(px))
        assert bin(d).count("1") <= 8, seed
