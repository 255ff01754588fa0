"""Property-based tests (hypothesis) over the round-13 codec family:
lossless roundtrips for PNG/GIF/BMP on arbitrary images, JPEG structural
invariants, and adversarial WARC bodies (content that looks like WARC
framing must ride through the length-delimited body untouched)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_lake_medallion_architecture_project_spark.operators.gif import decode_gif, encode_gif
from data_lake_medallion_architecture_project_spark.operators.jpeg import decode_jpeg, encode_jpeg
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from data_lake_medallion_architecture_project_spark.operators.webp import decode_webp, encode_webp
from data_lake_medallion_architecture_project_spark.sources.warc import (
    build_warc_blob,
    parse_warc,
)

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


def _image(seed: int, h: int, w: int, colors: int | None = None) -> np.ndarray:
    """Random uint8 RGB image. With ``colors`` set, pixels are drawn from
    a random palette of exactly that many entries, so the image carries AT
    MOST ``colors`` distinct colors regardless of h*w — the GIF strategy
    must stay inside encode_gif's ≤256-distinct-color domain even when
    dims exceed the palette size (an unconstrained draw at colors=256 on
    a 260-pixel image is out-of-domain and correctly rejected)."""
    rng = np.random.default_rng(seed)
    if colors is None:
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    palette = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return palette[rng.integers(0, colors, (h, w))]


@settings(max_examples=40, deadline=None, derandomize=True)
@given(seed=st.integers(0, 2**31), dims=_dims)
def test_png_roundtrip_arbitrary_images(seed, dims):
    h, w = dims
    px = _image(seed, h, w)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(seed=st.integers(0, 2**31), dims=_dims)
def test_bmp_roundtrip_arbitrary_images(seed, dims):
    h, w = dims
    px = _image(seed, h, w)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**31),
    dims=_dims,
    colors=st.integers(1, 256),
    interlace=st.booleans(),
)
def test_gif_roundtrip_arbitrary_palettes(seed, dims, colors, interlace):
    h, w = dims
    px = _image(seed, h, w, colors=colors)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**31),
    dims=_dims,
    quality=st.integers(30, 100),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
)
def test_jpeg_structural_invariants(seed, dims, quality, sub):
    """Lossy, so no byte equality — but shape/dtype/range survive every
    quality and layout, and decode never raises on its own encoder's
    output."""
    h, w = dims
    px = _image(seed, h, w)
    out = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    assert out.shape == px.shape and out.dtype == np.uint8


_warc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(_warc_text | st.none(), min_size=1, max_size=8))
def test_warc_roundtrip_arbitrary_unicode_bodies(texts):
    """Any unicode body — including strings containing CRLF runs, WARC
    header lines, or full fake records — must ride through the
    length-delimited framing byte-exactly and never create phantom
    records."""
    rows = list(enumerate(texts))
    recs = parse_warc(build_warc_blob(rows))
    assert len(recs) == len(rows)  # no phantom, no loss
    for (i, t), r in zip(rows, recs):
        assert r["uri"] == f"http://example.org/doc/{i}"
        assert r["body"].decode("utf-8") == (t or "")


def test_warc_body_containing_fake_record_is_not_reparsed():
    """The directed version of the property: a body that IS a syntactically
    complete WARC record must come back as opaque bytes."""
    evil = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    recs = parse_warc(build_warc_blob([(1, evil), (2, "after")]))
    assert len(recs) == 2
    assert recs[0]["body"].decode() == evil
    assert recs[1]["body"].decode() == "after"


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(st.binary(max_size=300), min_size=1, max_size=8))
def test_warc_arbitrary_byte_bodies_ride_through(bodies):
    """The real-crawl case the unicode property can't reach: bodies of
    ARBITRARY bytes — invalid UTF-8, embedded CRLFCRLF, fake WARC version
    lines — must come back byte-exact from the length-delimited framing,
    with no phantom records and no decode involvement at parse level."""
    raw = b"".join(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.org/doc/" + str(i).encode()
        + b"\r\nContent-Length: " + str(len(body)).encode()
        + b"\r\n\r\n" + body + b"\r\n\r\n"
        for i, body in enumerate(bodies)
    )
    recs = parse_warc(raw)
    assert len(recs) == len(bodies)
    for i, (body, rec) in enumerate(zip(bodies, recs)):
        assert rec["body"] == body
        assert rec["uri"] == f"http://example.org/doc/{i}"


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**31),
    dims=_dims,
    subtract_green=st.booleans(),
    cache_bits=st.sampled_from([0, 3, 8]),
    use_lz77=st.booleans(),
)
def test_webp_roundtrip_arbitrary_images(
    seed, dims, subtract_green, cache_bits, use_lz77
):
    """VP8L is lossless for arbitrary truecolor input across the whole
    encoder feature matrix (transform x cache x LZ77) — any palette-size
    assumption, cache-hash slip, or run-boundary bug breaks byte
    equality somewhere in this sweep."""
    h, w = dims
    px = _image(seed, h, w)
    out = decode_webp(
        encode_webp(
            px,
            subtract_green=subtract_green,
            cache_bits=cache_bits,
            use_lz77=use_lz77,
        )
    )
    assert np.array_equal(out, px)
