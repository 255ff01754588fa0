"""Pure-stdlib GIF codec — the LZW-compressed lossless member of the
built-in image container family.

``decode_gif`` handles real GIF87a/GIF89a single-frame streams: global
AND local color tables, variable-width LZW with clear/EOI codes,
interlaced row order (the four-pass layout), GCE/comment/application
extension blocks (skipped — transparency renders as its palette color,
the right call for feature extraction where every pixel needs a value).
``encode_gif`` writes GIF89a with a 256-entry global palette and real LZW
(dynamic dictionary, code-width growth, dictionary reset at 4096), with
optional interlacing, so any GIF reader opens its output.

GIF is LOSSLESS for images with ≤256 distinct colors — unlike JPEG, a
decode(encode(px)) roundtrip is bit-exact, which is what lets the
``image_dhash_catalog_gif`` registry query certify this codec end-to-end
against the same pixel-arithmetic DuckDB oracle as the BMP/PNG catalogs
(plans/extensions.py). Images with more than 256 distinct colors are the
caller's problem (``encode_gif`` raises rather than silently quantizing —
deterministic engines must not invent a palette); the documented pre-step
is ``quantize_median_cut``, a deterministic Heckbert median-cut reducer,
so truecolor→GIF is the two-step ``encode_gif(quantize_median_cut(px))``.

Mirrors the role of the reference's opaque-media handling
(/root/reference/ stores payloads as bytes; decode never happens
in-engine there — here it is a first-class executor-side path).
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------- #
# Quantizer (the documented pre-step for truecolor sources)
# --------------------------------------------------------------------------- #


def quantize_median_cut(pixels: np.ndarray, max_colors: int = 256) -> np.ndarray:
    """Deterministic median-cut palette quantization: reduce an (h, w, 3)
    uint8 RGB array to at most ``max_colors`` distinct colors, so
    truecolor images compose into the GIF path as
    ``encode_gif(quantize_median_cut(px))`` instead of dead-ending on
    ``encode_gif``'s no-silent-quantization ValueError.

    Classic Heckbert median cut over the DISTINCT colors weighted by
    pixel counts: repeatedly split the box with the widest channel range
    (ties broken by pixel weight, then box age) at the weighted median of
    that channel, then replace each box with its weighted-mean color.
    Images already within budget come back unchanged (bit-exact), so the
    helper is safe to apply unconditionally upstream of the encoder.
    Everything is keyed on sorted distinct colors — no RNG, no dict
    ordering — so the output is replayable across runs and engines, the
    same determinism contract the codecs themselves carry."""
    if max_colors < 1 or max_colors > 256:
        raise ValueError("max_colors must be in 1..256")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    if len(colors) <= max_colors:
        return pixels.copy()

    def _box(idx: np.ndarray) -> tuple:
        c = colors[idx]
        spread = c.max(axis=0).astype(np.int64) - c.min(axis=0)
        return (idx, int(spread.max()), int(counts[idx].sum()))

    boxes = [_box(np.arange(len(colors)))]
    while len(boxes) < max_colors:
        # Widest box first (weight, then insertion order, break ties) —
        # only boxes with ≥2 distinct colors are splittable.
        best = max(
            (i for i, b in enumerate(boxes) if len(b[0]) > 1),
            key=lambda i: (boxes[i][1], boxes[i][2], -i),
            default=None,
        )
        if best is None:
            break
        idx, _, _ = boxes.pop(best)
        c = colors[idx]
        ch = int(np.argmax(c.max(axis=0).astype(np.int64) - c.min(axis=0)))
        idx = idx[np.argsort(c[:, ch], kind="stable")]
        cum = np.cumsum(counts[idx])
        split = int(np.searchsorted(cum, cum[-1] / 2)) + 1
        split = min(max(split, 1), len(idx) - 1)
        boxes.append(_box(idx[:split]))
        boxes.append(_box(idx[split:]))

    mapping = np.empty(len(colors), dtype=np.int64)
    palette = np.empty((len(boxes), 3), dtype=np.uint8)
    for i, (idx, _, _) in enumerate(boxes):
        weight = counts[idx].astype(np.float64)
        mean = (colors[idx] * weight[:, None]).sum(axis=0) / weight.sum()
        palette[i] = np.round(mean).astype(np.uint8)
        mapping[idx] = i
    return np.ascontiguousarray(palette[mapping[inverse]].reshape(h, w, 3))


# --------------------------------------------------------------------------- #
# Encoder
# --------------------------------------------------------------------------- #


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Variable-width LZW per the GIF spec: start at min_code_size+1 bits,
    grow after the dictionary fills a width, emit CLEAR and reset at 4096
    entries, terminate with EOI. LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table, next_code, width = fresh()
        buf = (idx,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]


def encode_gif(
    pixels: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array with ≤256 distinct colors as a
    REAL GIF89a (global palette, true variable-width LZW). Raises
    ValueError past 256 colors — no silent quantization."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF encode needs <=256 distinct colors, got {len(colors)}; "
            "quantize upstream (quantize_median_cut)"
        )
    # Palette size must be a power of two >= 2 entries.
    bits = max(1, int(len(colors) - 1).bit_length())
    palette = np.zeros((1 << bits, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx_plane = inverse.reshape(h, w)
    rows = _interlace_order(h) if interlace else range(h)
    indices = [int(i) for y in rows for i in idx_plane[y]]

    min_code = max(2, bits)
    lzw = _lzw_encode(indices, min_code)
    sub_blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        sub_blocks.append(len(chunk))
        sub_blocks += chunk
    sub_blocks.append(0)  # block terminator

    screen = struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    img_desc = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    return (
        b"GIF89a"
        + screen
        + palette.tobytes()
        + img_desc
        + bytes([min_code])
        + bytes(sub_blocks)
        + b"\x3b"  # trailer
    )


# --------------------------------------------------------------------------- #
# Decoder
# --------------------------------------------------------------------------- #


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code != clear:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data ends short of the image size")
    return out[:n_pixels]


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a payload to an (h, w, 3)
    uint8 RGB array — pure stdlib. Interlaced frames are de-interlaced;
    extension blocks are skipped; a local color table overrides the
    global one."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            pos += 1
            indices = np.array(
                _lzw_decode(bytes(lzw), min_code, w * h), dtype=np.int64
            )
            if np.any(indices >= len(pal)):
                raise ValueError("GIF index outside the color table")
            rows = indices.reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                ordered = np.empty_like(rows)
                ordered[_interlace_order(h)] = rows
                rows = ordered
            return np.ascontiguousarray(pal[rows])
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")
