"""Pure-stdlib WebP-lossless / VP8L codec (operators/webp.py): bit-exact
roundtrips across the encoder feature matrix, prefix-code machinery
invariants (Kraft completeness, code-length-code alignment), distance-
table structure pins, malformed streams, and decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.webp import (
    _DIST_MAP,
    _huffman_lengths,
    decode_webp,
    encode_webp,
)


def _texture(seed: int, h: int = 23, w: int = 31) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("cache_bits", [0, 4, 8])
@pytest.mark.parametrize("use_lz77", [False, True])
def test_roundtrip_feature_matrix(subtract_green, cache_bits, use_lz77):
    img = _texture(4)
    out = decode_webp(
        encode_webp(
            img,
            subtract_green=subtract_green,
            cache_bits=cache_bits,
            use_lz77=use_lz77,
        )
    )
    assert np.array_equal(out, img)


def test_runs_and_small_palettes_roundtrip():
    """Run-heavy and low-entropy images drive the LZ77 and color-cache
    paths hard (and the single-symbol / simple-code writer branches)."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    img = pal[np.repeat(rng.integers(0, 3, (9, 5)), 7, axis=1)]  # long runs
    assert np.array_equal(decode_webp(encode_webp(img, cache_bits=8)), img)
    flat = np.full((13, 29, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(flat)), flat)
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(one)), one)


def test_kraft_completeness_across_random_frequencies():
    """Strict VP8L decoders reject incomplete prefix codes — every code we
    build must hit Kraft sum exactly 1 (or be empty/singleton)."""
    rng = np.random.default_rng(2)
    for _ in range(200):
        n = int(rng.integers(2, 400))
        freqs = [
            int(v) if rng.random() < 0.4 else 0
            for v in rng.integers(1, 1 << 20, n)
        ]
        if not any(freqs):
            freqs[0] = 1
        lengths = _huffman_lengths(freqs, 15)
        assert max(lengths) <= 15
        used = [l for l in lengths if l > 0]
        if len(used) >= 2:
            assert abs(sum(2.0 ** -l for l in used) - 1.0) < 1e-12


# libwebp's public plane_to_code_lut (src/dsp/lossless_common.h): the
# INVERSE mapping, 8 dy-rows × 16 dx-columns (dx = 8 - col), forward
# references marked 255. An independent encoding of the same spec table,
# so deriving _DIST_MAP from it here cross-checks the transcription.
_PLANE_TO_CODE_LUT = [
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
]


def test_distance_table_matches_inverse_lut_and_structure():
    """No reference binary exists in this sandbox, so the 120-entry 2D
    distance table is pinned two ways: (a) it must derive exactly from
    libwebp's inverse plane_to_code_lut — an independently-structured
    encoding of the same spec table that is itself checked to be a
    permutation of 0..119 with exactly the 8 forward cells invalid; and
    (b) structural invariants (window bounds, strictly-backward refs at
    the 16-px catalog minimum, the UP/LEFT anchors the encoder emits)."""
    vals = [v for v in _PLANE_TO_CODE_LUT if v != 255]
    assert sorted(vals) == list(range(120))
    assert _PLANE_TO_CODE_LUT.count(255) == 8
    derived: list = [None] * 120
    for i, v in enumerate(_PLANE_TO_CODE_LUT):
        if v == 255:
            continue
        dy, col = divmod(i, 16)
        derived[v] = (8 - col, dy)
    assert tuple(derived) == _DIST_MAP
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    for dx, dy in _DIST_MAP:
        assert -7 <= dx <= 8 and 0 <= dy <= 7
        assert dy * 16 + dx >= 1  # strictly backward at width >= 16


def test_malformed_streams_fail_loudly():
    img = _texture(1)
    blob = encode_webp(img)
    with pytest.raises(ValueError, match="not a RIFF/WEBP"):
        decode_webp(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(blob[:-10])
    with pytest.raises(ValueError, match="signature"):
        i = blob.find(b"VP8L") + 8
        decode_webp(blob[:i] + b"\x00" + blob[i + 1 :])
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_webp(
            b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (0).to_bytes(4, "little")
        )
    with pytest.raises(ValueError, match="dimensions"):
        encode_webp(np.zeros((0, 4, 3), dtype=np.uint8))


def test_decode_image_dispatches_webp():
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _HAS_PIL,
        decode_image,
    )

    img = _texture(7)
    if _HAS_PIL:
        pytest.skip("pillow present: WebP routes to libwebp")
    assert np.array_equal(decode_image(encode_webp(img)), img)


def test_spark_dhash_identical_across_bmp_and_webp(spark):
    """Lossless ⇒ the WebP catalog must hash every image EXACTLY like the
    BMP catalog (same pixels, different container)."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_fake_textured_bmp_payloads,
        attach_fake_textured_webp_payloads,
        image_dhash,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    bmp = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(attach_fake_textured_bmp_payloads(docs)).collect()
    }
    webp = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(
            attach_fake_textured_webp_payloads(docs)
        ).collect()
    }
    assert bmp == webp and len(bmp) == 40


@pytest.mark.parametrize("n_colors", [1, 2, 4, 5, 16, 17, 256])
@pytest.mark.parametrize("cache_bits", [0, 6])
def test_palette_transform_roundtrip_across_bundling_tiers(n_colors, cache_bits):
    """Color-indexing (the layout cwebp picks for screenshots): every
    pixel-bundling tier — 8/4/2 indices per byte for ≤2/≤4/≤16 colors,
    unbundled above — plus the delta-coded table sub-image must roundtrip
    bit-exactly, with and without the color cache on the packed stream."""
    rng = np.random.default_rng(n_colors * 31 + cache_bits)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, (23, 31))]
    out = decode_webp(encode_webp(img, palette=True, cache_bits=cache_bits))
    assert np.array_equal(out, img)


def test_palette_transform_rejects_truecolor_and_compresses_palettes():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="quantize upstream"):
        encode_webp(
            rng.integers(0, 256, (30, 30, 3), dtype=np.uint8), palette=True
        )
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 4, (40, 40))]
    indexed = encode_webp(img, palette=True)
    plain = encode_webp(img, palette=False)
    assert np.array_equal(decode_webp(indexed), img)
    # 4 colors bundle 4 px/byte: the indexed stream must be much smaller
    assert len(indexed) < len(plain)


def test_palette_non_multiple_widths_pad_correctly():
    """Widths that don't divide the bundling factor exercise the padded
    final packed byte of every row."""
    rng = np.random.default_rng(7)
    for n_colors, w in ((2, 9), (4, 5), (16, 3)):
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, n_colors, (5, w))]
        assert np.array_equal(
            decode_webp(encode_webp(img, palette=True)), img
        )


# --------------------------------------------------------------------------- #
# Round 15: predictor transform + real-reader bitstream conventions
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("mode", range(14))
def test_predictor_all_14_modes_roundtrip(mode):
    """Every predictor mode, forced on every tile: the encoder's
    vectorized per-plane forward pass and the decoder's packed-int SWAR
    inverse are independent implementations of the same RFC 9649 §4.2.1
    arithmetic, so a slip in either (average floor, Select distance,
    clamp bounds, trunc-toward-zero halving) breaks the bit-exact
    roundtrip for that mode."""
    img = _texture(mode + 100)
    out = decode_webp(
        encode_webp(img, predictor=True, _force_predictor_mode=mode)
    )
    assert np.array_equal(out, img)


@pytest.mark.parametrize("block_bits", [2, 3, 4, 5, 9])
@pytest.mark.parametrize("cache_bits", [0, 6])
def test_predictor_roundtrip_block_and_cache_matrix(block_bits, cache_bits):
    img = _texture(block_bits * 7 + cache_bits, h=21, w=37)
    out = decode_webp(
        encode_webp(
            img,
            predictor=True,
            predictor_block_bits=block_bits,
            cache_bits=cache_bits,
        )
    )
    assert np.array_equal(out, img)


def test_predictor_composes_with_subtract_green_in_cwebp_order():
    """cwebp writes subtract-green then predictor; inverses must run in
    reverse read order (prediction undone before green is re-added)."""
    img = _texture(55)
    for sg in (False, True):
        out = decode_webp(encode_webp(img, predictor=True, subtract_green=sg))
        assert np.array_equal(out, img)


def test_predictor_edge_shapes_and_rightmost_tr_rule():
    """1×1 / 1×N / N×1 exercise the black/L/T border overrides; forcing
    mode 3 (TR) on wider images exercises the exceptional rightmost-
    column rule (TR = the LEFTMOST pixel of the CURRENT row)."""
    rng = np.random.default_rng(3)
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3), (2, 2, 3)):
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        for mode in (None, 0, 3, 5, 9, 11, 12, 13):
            out = decode_webp(
                encode_webp(x, predictor=True, _force_predictor_mode=mode)
            )
            assert np.array_equal(out, x), (shape, mode)
    wide = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
    for mode in (3, 5, 9, 10):  # every TR-consuming mode
        out = decode_webp(
            encode_webp(wide, predictor=True, _force_predictor_mode=mode)
        )
        assert np.array_equal(out, wide), mode


def test_predictor_shrinks_gradients():
    """The whole point of the transform: smooth content should compress
    far better through prediction than through plain entropy coding."""
    grad = (
        (np.arange(48)[:, None, None] * 3 + np.arange(64)[None, :, None] * 2)
        % 256
    ).astype(np.uint8).repeat(3, axis=2)[:, :, :3]
    assert len(encode_webp(grad, predictor=True)) < len(encode_webp(grad)) / 4


def test_predictor_rejects_bad_params():
    img = _texture(1, h=4, w=4)
    with pytest.raises(ValueError, match="compose"):
        encode_webp(
            np.zeros((4, 4, 3), dtype=np.uint8), predictor=True, palette=True
        )
    with pytest.raises(ValueError, match="predictor_block_bits"):
        encode_webp(img, predictor=True, predictor_block_bits=1)


def test_predict_matches_independent_per_component_reference():
    """Third encoding of the mode arithmetic: a plain per-component
    reference implementation written here, compared against the
    decoder's packed-int SWAR _predict over random neighbor values —
    pins the SWAR average trick, Select's telescoped distances, and
    both clamp-add-subtract variants."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _predict,
    )

    def comps(v):
        return [(v >> s) & 0xFF for s in (24, 16, 8, 0)]

    def pack(cs):
        return (cs[0] << 24) | (cs[1] << 16) | (cs[2] << 8) | cs[3]

    def avg2(a, b):
        return (a + b) // 2

    def ref(mode, L, T, TL, TR):
        l, t, tl, tr = comps(L), comps(T), comps(TL), comps(TR)
        if mode == 0:
            return 0xFF000000
        if mode == 1:
            return L
        if mode == 2:
            return T
        if mode == 3:
            return TR
        if mode == 4:
            return TL
        if mode == 5:
            return pack([avg2(avg2(l[c], tr[c]), t[c]) for c in range(4)])
        if mode == 6:
            return pack([avg2(l[c], tl[c]) for c in range(4)])
        if mode == 7:
            return pack([avg2(l[c], t[c]) for c in range(4)])
        if mode == 8:
            return pack([avg2(tl[c], t[c]) for c in range(4)])
        if mode == 9:
            return pack([avg2(t[c], tr[c]) for c in range(4)])
        if mode == 10:
            return pack(
                [avg2(avg2(l[c], tl[c]), avg2(t[c], tr[c])) for c in range(4)]
            )
        if mode == 11:
            p = [l[c] + t[c] - tl[c] for c in range(4)]
            pL = sum(abs(p[c] - l[c]) for c in range(4))
            pT = sum(abs(p[c] - t[c]) for c in range(4))
            return L if pL < pT else T
        if mode == 12:
            return pack(
                [min(255, max(0, l[c] + t[c] - tl[c])) for c in range(4)]
            )
        a = [avg2(l[c], t[c]) for c in range(4)]
        return pack(
            [min(255, max(0, a[c] + int((a[c] - tl[c]) / 2)))
             for c in range(4)]
        )

    rng = np.random.default_rng(11)
    for _ in range(300):
        L, T, TL, TR = (
            int(v) for v in rng.integers(0, 1 << 32, 4, dtype=np.uint64)
        )
        for mode in range(14):
            assert _predict(mode, L, T, TL, TR) == ref(mode, L, T, TL, TR), mode


def test_simple_code_assigns_codes_by_transmission_order():
    """RFC 9649: in the 1/2-symbol simple form, code 0 belongs to the
    FIRST symbol transmitted — not the numerically smaller one. A stream
    listing symbols in descending order must decode them unswapped."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _BitReader,
        _BitWriter,
        _read_prefix_code,
        _read_symbol,
    )

    bw = _BitWriter()
    bw.write(1, 1)  # simple code
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(200, 8)  # DESCENDING transmission order
    bw.write(10, 8)
    bw.write(0b10, 2)  # data: code 0 then code 1
    br = _BitReader(bw.bytes())
    tree = _read_prefix_code(br, 256)
    assert _read_symbol(br, tree) == 200  # code 0 -> first transmitted
    assert _read_symbol(br, tree) == 10


def test_single_symbol_codes_consume_zero_bits():
    """libwebp's BuildHuffmanTable gives a lone symbol a 0-bit code, so
    a conforming reader consumes NO data bits for it — and our writer
    must emit none (the alpha channel is a single-symbol code in nearly
    every opaque image, so a 1-bit convention would desync every real
    reader on every image)."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _BitReader,
        _BitWriter,
        _read_prefix_code,
        _read_symbol,
    )

    bw = _BitWriter()
    bw.write(1, 1)  # simple code
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # in 8 bits
    bw.write(77, 8)
    br = _BitReader(bw.bytes())
    tree = _read_prefix_code(br, 256)
    before = (br._pos, br._n)
    for _ in range(50):
        assert _read_symbol(br, tree) == 77
    assert (br._pos, br._n) == before  # zero bits consumed


def test_sub_images_carry_no_meta_prefix_bit():
    """Per RFC 9649 / libwebp (ReadHuffmanCodes gates on
    allow_recursion), only the level-0 image has the meta-prefix bit;
    transform sub-images go straight from cache info to prefix codes.
    _emit_image/_read_image must agree at BOTH levels, and the two
    levels must differ by exactly that one bit."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _BitReader,
        _BitWriter,
        _emit_image,
        _read_image,
    )

    vals = [0xFF000000 | (v << 8) for v in (3, 1, 4, 1, 5, 9, 2, 6)]
    for level0 in (False, True):
        bw = _BitWriter()
        _emit_image(bw, vals, 0, False, level0=level0)
        assert _read_image(_BitReader(bw.bytes()), 4, 2, level0=level0) == vals
    lo, hi = _BitWriter(), _BitWriter()
    _emit_image(lo, vals, 0, False, level0=False)
    _emit_image(hi, vals, 0, False, level0=True)
    lo_bits = len(lo._out) * 8 + lo._n
    hi_bits = len(hi._out) * 8 + hi._n
    assert hi_bits == lo_bits + 1  # exactly the meta-prefix bit


# --------------------------------------------------------------------------- #
# Round 15 (cont.): cross-color transform + meta-prefix entropy images
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize(
    "force",
    [(0, 0, 0), (32, 32, 0), (-64, 64, -32), (16, -16, 64), (-32, 0, 32)],
)
def test_cross_color_forced_multipliers_roundtrip(force):
    """Cross-color with pinned per-tile multipliers across the candidate
    grid corners: the encoder's vectorized per-plane forward subtract
    and the decoder's recover-red-then-blue inverse are independent
    implementations of the 3.5-fixed-point delta (int8 casts, arithmetic
    >>5, blue depending on the RECOVERED red)."""
    img = _texture(sum(abs(v) for v in force) + 1)
    out = decode_webp(
        encode_webp(
            img, cross_color=True, subtract_green=False,
            _force_cross_color=force,
        )
    )
    assert np.array_equal(out, img)


@pytest.mark.parametrize("cc_bits", [2, 3, 4, 9])
def test_cross_color_auto_selection_roundtrip(cc_bits):
    img = _texture(cc_bits * 13, h=21, w=34)
    out = decode_webp(encode_webp(img, cross_color=True, cc_block_bits=cc_bits))
    assert np.array_equal(out, img)


def test_cross_color_composes_with_predictor_in_cwebp_order():
    """cwebp stream order: [subtract-green,] predictor, cross-color —
    the decoder must invert cross-color BEFORE prediction. Every stack
    combination roundtrips."""
    img = _texture(99)
    for sg in (False, True):
        for cache in (0, 6):
            out = decode_webp(
                encode_webp(
                    img, subtract_green=sg, predictor=True,
                    cross_color=True, cache_bits=cache,
                )
            )
            assert np.array_equal(out, img), (sg, cache)


def test_cross_color_shrinks_channel_correlated_content():
    """The transform's purpose: when red/blue track green, the per-tile
    multipliers should collapse the residuals."""
    gg = (np.arange(40)[:, None] * 3 + np.arange(50)[None, :] * 2) % 200
    img = np.stack(
        [(gg + 30) % 256, gg, (gg + 60) % 256], axis=2
    ).astype(np.uint8)
    full = encode_webp(img, predictor=True, cross_color=True,
                       subtract_green=False)
    plain = encode_webp(img, subtract_green=False)
    assert np.array_equal(decode_webp(full), img)
    assert len(full) < len(plain) / 4


def test_cross_color_inverse_matches_independent_reference():
    """Third encoding of the delta arithmetic: plain per-pixel ints here
    vs the decoder's vectorized inverse, over random tiles/pixels —
    pins the int8 casts and the arithmetic shift on negatives."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _apply_inverse_cross_color,
    )

    rng = np.random.default_rng(21)
    h, w, bits = 9, 13, 2
    tiles_h, tiles_w = (h + 3) >> 2, (w + 3) >> 2
    cts = [
        0xFF000000 | (int(r2b) << 16) | (int(g2b) << 8) | int(g2r)
        for r2b, g2b, g2r in rng.integers(0, 256, (tiles_h * tiles_w, 3))
    ]
    argb = rng.integers(0, 1 << 32, (h, w), dtype=np.uint64).astype(np.int64)
    got = _apply_inverse_cross_color(argb, cts, bits)

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            ct = cts[(y >> bits) * tiles_w + (x >> bits)]
            g2r, g2b, r2b = s8(ct & 0xFF), s8((ct >> 8) & 0xFF), s8(
                (ct >> 16) & 0xFF
            )
            v = int(argb[y, x])
            g = s8((v >> 8) & 0xFF)
            red = (((v >> 16) & 0xFF) + ((g2r * g) >> 5)) & 0xFF
            blue = (
                (v & 0xFF) + ((g2b * g) >> 5) + ((r2b * s8(red)) >> 5)
            ) & 0xFF
            want = (v & ~0xFF00FF) | (red << 16) | blue
            assert int(got[y, x]) == want, (y, x)


@pytest.mark.parametrize("meta_bits", [2, 3, 4])
@pytest.mark.parametrize("cache_bits", [0, 6])
def test_meta_prefix_groups_roundtrip(meta_bits, cache_bits):
    """Meta-prefix entropy image: two prefix-code groups in a per-tile
    checkerboard (groups switch mid-row — the dispatch a reader must
    get right), tokens coded by their starting pixel's group, the color
    cache global across groups."""
    img = _texture(meta_bits * 31 + cache_bits, h=37, w=45)
    out = decode_webp(
        encode_webp(img, meta_prefix_bits=meta_bits, cache_bits=cache_bits)
    )
    assert np.array_equal(out, img)


def test_meta_prefix_composes_with_full_transform_stack():
    img = _texture(7, h=33, w=41)
    out = decode_webp(
        encode_webp(
            img, meta_prefix_bits=2, predictor=True, cross_color=True,
            cache_bits=5,
        )
    )
    assert np.array_equal(out, img)
    pal_img = np.array([[10, 200, 30]], dtype=np.uint8)[
        np.zeros((19, 23), dtype=np.int64)
    ]
    out = decode_webp(encode_webp(pal_img, palette=True, meta_prefix_bits=2))
    assert np.array_equal(out, pal_img)


def test_meta_prefix_single_tile_degenerates_to_one_group():
    x = _texture(3, h=3, w=3)
    blob = encode_webp(x, meta_prefix_bits=9)  # 512-px tiles: one tile
    assert np.array_equal(decode_webp(blob), x)


def test_lossy_and_imageless_extended_boundaries():
    """The honest remaining boundaries: lossy VP8 routes to pillow
    (even inside a VP8X wrapper); a VP8X with no image chunk at all is
    malformed, not a dispatch case."""
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    lossy = b"VP8 " + (2).to_bytes(4, "little") + b"\x00\x00"
    blob = b"RIFF" + (4 + len(vp8x) + len(lossy)).to_bytes(4, "little") \
        + b"WEBP" + vp8x + lossy
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(blob)
    empty = b"RIFF" + (4 + len(vp8x)).to_bytes(4, "little") + b"WEBP" + vp8x
    with pytest.raises(ValueError, match="no VP8L chunk"):
        decode_webp(empty)


def test_vp8x_extended_container_with_metadata_roundtrips():
    """Real cwebp output wraps VP8L in VP8X whenever metadata rides
    along (ICCP before the image, EXIF after) — a still lossless image
    inside an extended container must decode natively, hopping both
    metadata chunks; only ANIMATION routes to pillow."""
    img = _texture(42)
    blob = encode_webp(img, predictor=True, extended=True)
    assert blob[12:16] == b"VP8X" and b"ICCP" in blob and b"EXIF" in blob
    assert np.array_equal(decode_webp(blob), img)
    # flip the animation bit: frame compositing is the pillow boundary
    animated = bytearray(blob)
    animated[20] |= 0x02
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(bytes(animated))


def test_cross_color_forced_multipliers_off_the_candidate_grid():
    """_force_cross_color accepts ANY int8 triple, not just the encoder's
    scoring grid — off-grid values roundtrip and out-of-range raise."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (15, 17, 3), dtype=np.uint8)
    for force in [(127, -128, 55), (1, 2, 3), (-1, 0, 99)]:
        out = decode_webp(
            encode_webp(
                img, cross_color=True, subtract_green=False,
                _force_cross_color=force,
            )
        )
        assert np.array_equal(out, img), force
    with pytest.raises(ValueError, match="int8"):
        encode_webp(img, cross_color=True, _force_cross_color=(200, 0, 0))


def test_repeated_transform_type_is_rejected():
    """RFC 9649: each transform at most once — a repeat is a corrupt
    stream and must quarantine (ValueError), not decode garbage by
    running an inverse twice."""
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _BitReader,
    )

    img = _texture(13)
    blob = bytearray(encode_webp(img))  # subtract-green on by default
    i = blob.find(b"VP8L") + 8
    # VP8L header: sig(8) + w(14) + h(14) + alpha(1) + version(3) = 40
    # bits, then transform bits. Craft a stream with SUBTRACT_GREEN
    # twice by re-emitting the header with duplicated transform bits.
    from data_lake_medallion_architecture_project_spark.operators.webp import (
        _BitWriter,
    )

    br = _BitReader(bytes(blob[i:]))
    bw = _BitWriter()
    bw.write(br.read(8), 8)    # signature
    bw.write(br.read(14), 14)  # w-1
    bw.write(br.read(14), 14)  # h-1
    bw.write(br.read(1), 1)    # alpha hint
    bw.write(br.read(3), 3)    # version
    assert br.read(1) == 1 and br.read(2) == 2  # original SUBTRACT_GREEN
    for _ in range(2):         # duplicated transform header
        bw.write(1, 1)
        bw.write(2, 2)
    # copy the remaining bits verbatim (no-more-transforms + image data)
    rest = []
    try:
        while True:
            rest.append(br.read(1))
    except ValueError:
        pass
    for bit in rest:
        bw.write(bit, 1)
    body = bw.bytes()
    forged = (
        b"RIFF" + (12 + 8 + len(body)).to_bytes(4, "little") + b"WEBP"
        + b"VP8L" + len(body).to_bytes(4, "little") + body
    )
    with pytest.raises(ValueError, match="repeated"):
        decode_webp(forged)


def test_scalar_and_vectorized_emit_paths_byte_identical(monkeypatch):
    """Round 15: _emit_image routes small inputs through the scalar token
    loop and large ones through the vectorized pipeline (crossover
    _VEC_MIN_PIXELS). Forcing each path over the SAME images — sizes
    straddling the production threshold, the full parameter grid — must
    yield identical bytes: the vectorized tokenize/cache/emission is a
    pure reformulation, not a format change."""
    from data_lake_medallion_architecture_project_spark.operators import webp

    params = [
        dict(),
        dict(cache_bits=0),
        dict(cache_bits=2),
        dict(predictor=True, cross_color=True, meta_prefix_bits=2),
        dict(meta_prefix_bits=3),
    ]
    rng = np.random.default_rng(5)
    flat = np.full((50, 50, 3), 9, dtype=np.uint8)  # run/copy-heavy
    for img in (_texture(6, 40, 40), _texture(7, 64, 64), flat):
        for kw in params:
            monkeypatch.setattr(webp, "_VEC_MIN_PIXELS", 1 << 30)
            scalar_bytes = webp.encode_webp(img, **kw)
            monkeypatch.setattr(webp, "_VEC_MIN_PIXELS", 0)
            vector_bytes = webp.encode_webp(img, **kw)
            assert scalar_bytes == vector_bytes, kw
            assert (decode_webp(vector_bytes) == img).all()
