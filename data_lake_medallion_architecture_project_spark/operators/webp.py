"""Pure-stdlib WebP-lossless (VP8L) codec — the web-native lossless
member of the built-in image container family (BMP/PNG/GIF/JPEG →
operators/multimodal.py, gif.py, jpeg.py).

``encode_webp`` writes a real RIFF/WEBP container with a VP8L chunk:
canonical prefix codes (DEFLATE-style code assignment, depth-limited,
Kraft-complete — libwebp rejects incomplete codes), the code-length
code with 16/17/18 run symbols, optional subtract-green transform,
optional color cache (the ``0x1e35a7bd`` multiplicative hash),
left-run LZ77 copies through the 2D distance-code mapping, ALL FOUR
transforms (subtract-green, 14-mode predictor, cross-color,
color-indexing with pixel bundling), and meta-prefix entropy images
(multiple prefix-code groups in a tile map). Any WebP reader opens its
output. ``decode_webp`` walks the container and the VP8L bitstream
back: the complete lossless feature set — simple and normal prefix
codes (transmission-order simple codes, 0-bit single-symbol codes),
meta-prefix group dispatch, LZ77 with both 2D-mapped and plain
distances, color cache, and all four transform inverses in reverse
read order — so real ``cwebp -lossless`` output decodes natively,
including VP8X-wrapped stills carrying EXIF/XMP/ICC metadata. Lossy
VP8 and animated WebP raise NotImplementedError (the pillow dispatch
point) — the same loud-fallback contract as progressive JPEG.

VP8L is LOSSLESS, so decode(encode(px)) is bit-exact and the
``image_dhash_catalog_webp`` registry query certifies the whole codec
against the identical pixel-arithmetic DuckDB oracle as the
BMP/PNG/GIF catalogs (plans/extensions.py). Bitstream grammar follows
the public spec (RFC 9649 §3-§5); the 120-entry 2D distance table is
transcribed from §4.2.2. Conformance caveat: no reference WebP
implementation exists in this sandbox, so cross-implementation reads
are certified only for streams our encoder emits (roundtrip +
registry oracle); the spec-table transcription is test-pinned by
structure (dx bounds, monotone dy bands) rather than by a golden file.

Mirrors the role of the reference's opaque-media handling
(/root/reference/ stores payloads as bytes; decode never happens
in-engine there — here it is a first-class executor-side path).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# --------------------------------------------------------------------------- #
# Bit I/O — VP8L packs LSB-first (RFC 9649 §3.4); prefix-code bits are
# consumed one at a time walking the code tree from the root (codes are
# DEFLATE-canonical, emitted MSB-of-code-first).
# --------------------------------------------------------------------------- #


def _rev_bits(code: int, nbits: int) -> int:
    """Reverse the low ``nbits`` bits of ``code`` — an MSB-first prefix
    code becomes the value whose LSB-first emission produces the same
    bit sequence on the wire."""
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Emit a prefix code MSB-first (the tree-walk read order). The
        stream is identical to writing the bits one at a time; packing
        them as a single LSB-first write of the bit-reversed value avoids
        nbits method calls per code (the encoder's measured hotspot —
        hot paths precompute the reversal via :func:`_rev_bits` and call
        :meth:`write` directly)."""
        self.write(_rev_bits(code, nbits), nbits)

    def write_many(self, values: "np.ndarray", nbits: "np.ndarray") -> None:
        """Append many LSB-first fields at once — bit-identical to calling
        :meth:`write` per element (zero-width fields are no-ops, exactly
        like the skipped ``if nb:`` writes in the scalar emit loop).
        Values must already fit their widths (codes/extras do by
        construction). The pending accumulator is prepended as field 0 so
        the vectorized packing needs no alignment special case; the
        trailing partial byte goes back into the accumulator."""
        values = np.concatenate([np.asarray([self._acc], dtype=np.int64), values])
        nbits = np.concatenate([np.asarray([self._n], dtype=np.int64), nbits])
        self._acc = 0
        self._n = 0
        end = np.cumsum(nbits)
        off = end - nbits
        total = int(end[-1])
        nbytes = (total + 7) >> 3
        # Each field spans ≤ 4 byte lanes (≤ 17-bit fields shifted ≤ 7).
        # Distinct fields occupy DISJOINT bits, so the per-byte combine is
        # an exact integer ADD (== OR), which np.bincount with weights
        # computes in one C pass per lane — float64 sums stay exact (each
        # byte total < 256 « 2^53).
        shifted = values.astype(np.uint64) << (off & 7).astype(np.uint64)
        b0 = (off >> 3).astype(np.int64)
        buf = np.zeros(nbytes + 8, dtype=np.float64)
        for k in range(4):
            lane = ((shifted >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.float64)
            buf += np.bincount(b0 + k, weights=lane, minlength=nbytes + 8)
        buf = buf.astype(np.uint8)
        full = total >> 3
        self._out += buf[:full].tobytes()
        if total & 7:
            self._acc = int(buf[full])
            self._n = total & 7

    def bytes(self) -> bytes:
        out = bytes(self._out)
        if self._n:
            out += bytes([self._acc & 0xFF])
        return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self._pos >= len(self._data):
                raise ValueError("truncated VP8L bitstream")
            self._acc |= self._data[self._pos] << self._n
            self._pos += 1
            self._n += 8
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._n -= nbits
        return v


# --------------------------------------------------------------------------- #
# Canonical prefix codes (DEFLATE assignment: by length, then symbol order)
# --------------------------------------------------------------------------- #


def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Code lengths from frequencies — Huffman, then depth-limited with a
    Kraft-sum repair that keeps the code COMPLETE (sum 2^-l == 1), which
    strict decoders require. A single used symbol gets DECLARED length 1
    (how simple codes transmit it), but decoders assign it a 0-bit code
    (libwebp's single-value special case), so emission must write no
    bits per occurrence — _emit_image zeroes those codebook entries."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    if not used:
        return [0] * n
    if len(used) == 1:
        out = [0] * n
        out[used[0]] = 1
        return out
    heap: list[tuple[int, int, tuple[int, ...]]] = [
        (freqs[s], s, (s,)) for s in used
    ]
    heapq.heapify(heap)
    depth = dict.fromkeys(used, 0)
    while len(heap) > 1:
        fa, ta, sa = heapq.heappop(heap)
        fb, tb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, min(ta, tb), sa + sb))
    lengths = [0] * n
    for s, d in depth.items():
        lengths[s] = min(d, max_len)
    # Kraft repair: clamping may overfill (> 1); lengthening the deepest
    # fixable symbols restores <= 1, then shortening greedily from the
    # shallow end restores == 1 (completeness).
    def kraft() -> float:
        return sum(2.0 ** -l for l in lengths if l > 0)

    while kraft() > 1.0:
        # lengthen a symbol strictly shallower than max_len
        cand = max(
            (s for s in used if lengths[s] < max_len),
            key=lambda s: lengths[s],
        )
        lengths[cand] += 1
    while kraft() < 1.0:
        # shorten the deepest symbol whose promotion keeps kraft <= 1
        gain = None
        for s in sorted(used, key=lambda s: -lengths[s]):
            if lengths[s] > 1 and kraft() + 2.0 ** -lengths[s] <= 1.0:
                gain = s
                break
        if gain is None:
            break
        lengths[gain] -= 1
    if abs(kraft() - 1.0) > 1e-12:
        raise AssertionError("prefix code repair failed to reach Kraft 1")
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), canonical per RFC 1951: codes increase
    within a length, lengths ascending, symbol order breaking ties."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Tree:
    """Decode tree for sequential MSB-first code bits."""

    __slots__ = ("left", "right", "leaf")

    def __init__(self) -> None:
        self.left: _Tree | None = None
        self.right: _Tree | None = None
        self.leaf: int | None = None


class _Table:
    """Flat one-shot decode table: index the next ``nbits`` stream bits
    (LSB-first, zero-padded at EOF — padding can only influence bits past
    the matched code's length, see :func:`_read_symbol`) and get the
    symbol plus its true length in one lookup, instead of one method
    call per bit walking a tree. Built only for Kraft-COMPLETE codes
    (every index maps to exactly one symbol); ``leaf`` is the 0-bit
    single-symbol special case."""

    __slots__ = ("nbits", "mask", "syms", "lens", "leaf")

    def __init__(self, nbits: int, syms: list, lens: list, leaf: int | None) -> None:
        self.nbits = nbits
        self.mask = (1 << nbits) - 1
        self.syms = syms
        self.lens = lens
        self.leaf = leaf


# LUTs above this code length pay more to build (2^max_len entries) than
# the per-symbol walk saves on small images; longer codes keep the tree.
_TABLE_MAX_BITS = 12


def _build_tree(lengths: list[int]) -> "_Table | _Tree":
    used = [s for s, l in enumerate(lengths) if l > 0]
    if not used:
        # Empty code (a symbol class the stream never uses, e.g. the
        # distance code of a copy-free image): represented as an empty
        # _Table so a group of tables stays eligible for the fast token
        # loop. Reading from it is invalid — _read_symbol reproduces the
        # empty _Tree's exact behavior ("truncated" at EOF, "invalid
        # prefix code path" otherwise).
        return _Table(0, [], [], None)
    if len(used) == 1:
        # Single-symbol codes consume ZERO bits per symbol (libwebp's
        # BuildHuffmanTable special case: the lone entry gets bits=0
        # regardless of its declared length) — a root-leaf decoder makes
        # _read_symbol return without touching the bit reader.
        return _Table(0, [], [], used[0])
    max_len = max((lengths[s] for s in used), default=0)
    if used and max_len <= _TABLE_MAX_BITS:
        # Kraft-complete ⟺ the canonical codes exactly fill the bit
        # space — exactly then every table index decodes unambiguously.
        # Incomplete/over-subscribed length sets (possible in hostile
        # external streams) keep the tree path so their error behavior
        # is bit-for-bit what it was.
        if sum(1 << (max_len - lengths[s]) for s in used) == 1 << max_len:
            size = 1 << max_len
            syms = [0] * size
            lens = [0] * size
            for sym, (code, nbits) in _canonical_codes(lengths).items():
                # First stream bit is the code's MSB but lands in bit 0
                # of the index, so the index pattern of this code is its
                # bit-reversal, repeated every 2^nbits slots.
                base = _rev_bits(code, nbits)
                step = 1 << nbits
                cnt = size >> nbits
                syms[base::step] = [sym] * cnt
                lens[base::step] = [nbits] * cnt
            return _Table(max_len, syms, lens, None)
    root = _Tree()
    for sym, (code, nbits) in _canonical_codes(lengths).items():
        node = root
        for i in range(nbits - 1, -1, -1):
            bit = (code >> i) & 1
            if bit:
                if node.right is None:
                    node.right = _Tree()
                node = node.right
            else:
                if node.left is None:
                    node.left = _Tree()
                node = node.left
        node.leaf = sym
    return root


def _read_symbol(br: _BitReader, tree: "_Table | _Tree") -> int:
    if type(tree) is _Table:
        if tree.leaf is not None:
            return tree.leaf
        if tree.nbits == 0:
            # Empty code: mirror the empty tree walk — it consumed one
            # bit (truncated at EOF) and then hit a missing child.
            if br._n == 0 and br._pos >= len(br._data):
                raise ValueError("truncated VP8L bitstream")
            raise ValueError("invalid VP8L prefix code path")
        # Inline peek: top up the accumulator, zero-padding past EOF.
        # The lookup's answer depends only on the code's own (real) bits:
        # a code that fits the remaining bits decodes identically to the
        # tree walk, and one that would need a padded bit has true length
        # > remaining, caught below — same "truncated" contract as the
        # bit-at-a-time reader.
        n = tree.nbits
        data = br._data
        while br._n < n and br._pos < len(data):
            br._acc |= data[br._pos] << br._n
            br._pos += 1
            br._n += 8
        idx = br._acc & tree.mask
        nbits = tree.lens[idx]
        if nbits > br._n:
            raise ValueError("truncated VP8L bitstream")
        br._acc >>= nbits
        br._n -= nbits
        return tree.syms[idx]
    node = tree
    while node.leaf is None:
        node = node.right if br.read(1) else node.left
        if node is None:
            raise ValueError("invalid VP8L prefix code path")
    return node.leaf


# --------------------------------------------------------------------------- #
# The code-length code (RFC 9649 §4.1.1)
# --------------------------------------------------------------------------- #

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit one prefix code: the simple 1/2-symbol form when possible,
    else the normal form (code-length code + 16/17/18 run symbols)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple code
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal code

    # RLE the symbol lengths with 16 (repeat prev nonzero) / 17/18 (zeros).
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i, n = 0, len(lengths)
    last_nz = 8  # spec: initial "previous length" for symbol 16 is 8
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            # Trailing zeros must be emitted too: without the explicit
            # max_symbol field the reader consumes length tokens until the
            # whole alphabet is filled, so truncating here would make it
            # eat DATA bits as lengths.
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            l = lengths[i]
            j = i
            while j < n and lengths[j] == l:
                j += 1
            run = j - i
            emitted = 0
            if l != last_nz:
                tokens.append((l, 0, 0))
                emitted = 1
            rep = run - emitted
            while rep >= 3:
                r = min(rep, 6)
                tokens.append((16, r - 3, 2))
                rep -= r
            for _ in range(rep):
                tokens.append((l, 0, 0))
            last_nz = l
            i = j

    cl_freqs = [0] * 19
    for sym, _, _ in tokens:
        cl_freqs[sym] += 1
    cl_lengths = _huffman_lengths(cl_freqs, 7)
    # num_code_lengths: how many ORDER slots we must transmit
    num = 19
    while num > 4 and cl_lengths[_CL_ORDER[num - 1]] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for k in range(num):
        bw.write(cl_lengths[_CL_ORDER[k]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    if len(cl_codes) == 1:  # single-symbol codes are read with 0 bits
        cl_codes[next(iter(cl_codes))] = (0, 0)
    # Pre-reverse once (≤19 entries) so the token loop is one write/code.
    cl_codes = {s: (_rev_bits(c, nb), nb) for s, (c, nb) in cl_codes.items()}
    for sym, extra, extra_bits in tokens:
        code, nb = cl_codes[sym]
        bw.write(code, nb)
        if extra_bits:
            bw.write(extra, extra_bits)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Tree:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        if first >= alphabet_size:
            raise ValueError("VP8L simple-code symbol outside the alphabet")
        if num_symbols == 1:
            return _Table(0, [], [], first)  # 0-bit single-symbol code
        second = br.read(8)
        if first == second:
            raise ValueError("VP8L simple code repeats a symbol")
        if second >= alphabet_size:
            raise ValueError("VP8L simple-code symbol outside the alphabet")
        # Codes are assigned by TRANSMISSION order (first symbol -> 0,
        # second -> 1), NOT canonically by symbol value: an external
        # stream may list them in descending order.
        return _Table(1, [first, second], [1, 1], None)
    num = br.read(4) + 4
    cl_lengths = [0] * 19
    for k in range(num):
        cl_lengths[_CL_ORDER[k]] = br.read(3)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    cl_tree = _build_tree(cl_lengths)
    lengths = [0] * alphabet_size
    i = 0
    prev_nz = 8
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = _read_symbol(br, cl_tree)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= alphabet_size:
                    raise ValueError("VP8L code lengths overflow alphabet")
                lengths[i] = prev_nz
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("VP8L code lengths overflow alphabet")
    return _build_tree(lengths)


# --------------------------------------------------------------------------- #
# LZ77 value <-> (prefix symbol, extra bits) (RFC 9649 §4.2.1)
# --------------------------------------------------------------------------- #


def _lz_symbol(value: int) -> tuple[int, int, int]:
    """value >= 1 -> (symbol, extra, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    nbits = (value - 1).bit_length() - 1
    sym = 2 * nbits + ((value - 1) >> (nbits - 1)) - 2
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return sym, value - offset - 1, extra_bits


def _lz_value(br: _BitReader, sym: int) -> int:
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


# _lz_symbol tabulated over the encoder's whole run-length domain (1..4096,
# the tokenizer's cap) so the vectorized emit path is a table take; built
# FROM the scalar function, so the two can't drift.
_LZ_SYM_TAB = np.zeros(4097, dtype=np.int64)
_LZ_EXTRA_TAB = np.zeros(4097, dtype=np.int64)
_LZ_EBITS_TAB = np.zeros(4097, dtype=np.int64)
for _v in range(1, 4097):
    _LZ_SYM_TAB[_v], _LZ_EXTRA_TAB[_v], _LZ_EBITS_TAB[_v] = _lz_symbol(_v)
del _v


# 2D distance mapping (RFC 9649 §4.2.2): distance codes 1..120 name a
# (dx, dy) neighbor in an 8-row window; larger codes are plain distances
# minus 120. Derived from libwebp's public plane_to_code_lut (the inverse
# 8×16 lookup) and validated against it structurally in tests: the LUT is
# an exact permutation of 0..119 with the 8 forward-reference cells
# marked invalid, and every derived entry is strictly backward at the
# 16-px minimum width.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_DIST_MAP_INDEX = {v: i + 1 for i, v in enumerate(_DIST_MAP)}


def _map_distance(dist_code: int, width: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dy * width + dx)


_CACHE_MUL = 0x1E35A7BD


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((argb * _CACHE_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)


# --------------------------------------------------------------------------- #
# Predictor transform (RFC 9649 §4.2.1) — 14 modes over packed ARGB.
# The decoder-side arithmetic below is deliberately written against packed
# ints (SWAR per-byte tricks), INDEPENDENTLY of the encoder's vectorized
# per-plane numpy forward pass: the same two-independent-encodings test
# discipline the distance table uses — a mode-arithmetic slip on either
# side fails the bit-exact roundtrip.
# --------------------------------------------------------------------------- #


def _swar_avg2(a: int, b: int) -> int:
    """Per-byte (x + y) >> 1 on packed ARGB without unpacking."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _swar_add(a: int, b: int) -> int:
    """Per-byte (x + y) & 0xFF on packed ARGB (residual + prediction)."""
    return (
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """One predicted packed-ARGB value from the three/four neighbors."""
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
        return _swar_avg2(_swar_avg2(L, TR), T)
    if mode == 6:
        return _swar_avg2(L, TL)
    if mode == 7:
        return _swar_avg2(L, T)
    if mode == 8:
        return _swar_avg2(TL, T)
    if mode == 9:
        return _swar_avg2(T, TR)
    if mode == 10:
        return _swar_avg2(_swar_avg2(L, TL), _swar_avg2(T, TR))
    if mode == 11:
        # Select: Manhattan distance of L and T to the gradient estimate
        # L + T - TL; |est - L| telescopes to |T - TL| (and vice versa).
        p_l = p_t = 0
        for sh in (24, 16, 8, 0):
            tl = (TL >> sh) & 0xFF
            p_l += abs(((T >> sh) & 0xFF) - tl)
            p_t += abs(((L >> sh) & 0xFF) - tl)
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            c = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
            out |= (0 if c < 0 else 255 if c > 255 else c) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        ave = _swar_avg2(L, T)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            d = a - ((TL >> sh) & 0xFF)
            # C-style truncation toward zero, NOT floor: (a - b) / 2
            c = a + (d // 2 if d >= 0 else -((-d) // 2))
            out |= (0 if c < 0 else 255 if c > 255 else c) << sh
        return out
    raise ValueError(f"VP8L predictor mode {mode} out of range 0..13")


def _apply_inverse_predictor(
    resid: list[int], modes: list[int], size_bits: int, w: int, h: int
) -> list[int]:
    """Reconstruct actual pixels from residuals, scan order (pixel (0,0)
    is black-predicted, the rest of row 0 L-predicted, the rest of
    column 0 T-predicted regardless of tile mode; the TR neighbor of a
    rightmost-column pixel is the LEFTMOST pixel of the current row —
    all per RFC 9649 §4.2.1)."""
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    out = [0] * (w * h)
    i = 0
    for y in range(h):
        mode_row = (y >> size_bits) * tiles_w
        for x in range(w):
            if y == 0:
                pred = 0xFF000000 if x == 0 else out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = modes[mode_row + (x >> size_bits)]
                tr = out[i - w + 1] if x + 1 < w else out[i - x]
                pred = _predict(mode, out[i - 1], out[i - w], out[i - w - 1], tr)
            out[i] = _swar_add(resid[i], pred)
            i += 1
    return out


# --------------------------------------------------------------------------- #
# Encoder
# --------------------------------------------------------------------------- #


# Below this pixel count the scalar token loop beats the vectorized
# pipeline's numpy constant factor (measured crossover ~48×48 at the full
# transform stack); sub-images and small thumbnails take the scalar path.
_VEC_MIN_PIXELS = 2048


def _emit_image_scalar(
    bw: _BitWriter, vals: list[int], cache_bits: int, cache_size: int,
    green_base: int, use_lz77: bool, level0: bool,
    meta_bits: int | None, width: int | None,
) -> None:
    """Scalar twin of :func:`_emit_image`'s vectorized pipeline — the
    original token loop, kept for small inputs (see the caller's
    docstring; byte identity between the two is test-pinned)."""
    cache = [-1] * cache_size
    # (pos, token): ("lit",a,r,g,b) ("copy",len,dist) ("cache",idx)
    tokens: list[tuple[int, tuple]] = []
    n = len(vals)
    i = 0
    while i < n:
        v = vals[i]
        if use_lz77 and i > 0 and vals[i - 1] == v:
            run = 1
            while i + run < n and vals[i + run] == v and run < 4096:
                run += 1
            tokens.append((i, ("copy", run, 1)))
            if cache_size:
                cache[_cache_key(v, cache_bits)] = v
            i += run
            continue
        if cache_size:
            k = _cache_key(v, cache_bits)
            if cache[k] == v:
                tokens.append((i, ("cache", k)))
                i += 1
                continue
            cache[k] = v
        tokens.append(
            (i, ("lit", (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                 v & 0xFF))
        )
        i += 1

    if meta_bits is not None:
        if not level0 or width is None:
            raise ValueError("meta-prefix needs level0 and an image width")
        tiles_w = (width + (1 << meta_bits) - 1) >> meta_bits
        tiles_h = ((n // width) + (1 << meta_bits) - 1) >> meta_bits
        tile_groups = [
            (tx + ty) % 2 for ty in range(tiles_h) for tx in range(tiles_w)
        ]
        n_groups = max(tile_groups) + 1

        def group_of(pos: int) -> int:
            ty = (pos // width) >> meta_bits
            tx = (pos % width) >> meta_bits
            return tile_groups[ty * tiles_w + tx]
    else:
        n_groups = 1

        def group_of(pos: int) -> int:
            return 0

    freqs = [
        [
            [0] * (green_base + cache_size), [0] * 256, [0] * 256,
            [0] * 256, [0] * 40,
        ]
        for _ in range(n_groups)
    ]
    for pos, t in tokens:
        fq = freqs[group_of(pos)]
        if t[0] == "lit":
            _, a, rr, gg, bb = t
            fq[0][gg] += 1
            fq[1][rr] += 1
            fq[2][bb] += 1
            fq[3][a] += 1
        elif t[0] == "copy":
            sym, _, _ = _lz_symbol(t[1])
            fq[0][256 + sym] += 1
            dsym, _, _ = _lz_symbol(_DIST_MAP_INDEX[(1, 0)])
            fq[4][dsym] += 1
        else:
            fq[0][green_base + t[1]] += 1

    group_lengths = [
        [_huffman_lengths(f, 15) for f in fq] for fq in freqs
    ]
    group_codes = []
    for lengths in group_lengths:
        codes = [_canonical_codes(l) for l in lengths]
        for cb in codes:
            if len(cb) == 1:  # single-symbol codes are read with 0 bits
                cb[next(iter(cb))] = (0, 0)
        # Store codes pre-reversed: the token loop below then emits each
        # one as a single LSB-first write (same bits on the wire as the
        # MSB-first tree-walk order, minus the per-bit call overhead).
        group_codes.append(
            [
                {s: (_rev_bits(c, nb), nb) for s, (c, nb) in cb.items()}
                for cb in codes
            ]
        )

    if cache_size:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta_bits is not None:
            bw.write(1, 1)  # meta-prefix image follows
            bw.write(meta_bits - 2, 3)
            # entropy image: meta index = (red << 8) | green
            _emit_image(
                bw,
                [0xFF000000 | (g << 8) for g in tile_groups],
                0,
                True,
                level0=False,
            )
        else:
            bw.write(0, 1)  # no meta-prefix image
    for lengths in group_lengths:
        for l in lengths:
            _write_prefix_code(bw, l)

    def emit(codebook: dict, sym: int) -> None:
        code, nb = codebook[sym]  # pre-reversed above
        bw.write(code, nb)

    for pos, t in tokens:
        codes = group_codes[group_of(pos)]
        if t[0] == "lit":
            _, a, rr, gg, bb = t
            emit(codes[0], gg)
            emit(codes[1], rr)
            emit(codes[2], bb)
            emit(codes[3], a)
        elif t[0] == "copy":
            sym, extra, nb = _lz_symbol(t[1])
            emit(codes[0], 256 + sym)
            if nb:
                bw.write(extra, nb)
            dsym, dextra, dnb = _lz_symbol(_DIST_MAP_INDEX[(1, 0)])
            emit(codes[4], dsym)
            if dnb:
                bw.write(dextra, dnb)
        else:
            emit(codes[0], green_base + t[1])


def _emit_image(
    bw: _BitWriter, vals: list[int], cache_bits: int, use_lz77: bool,
    level0: bool, meta_bits: int | None = None, width: int | None = None,
) -> None:
    """Emit one entropy-coded ARGB image stream (cache-info bit, the
    prefix codes, then the pixel data) — the unit both the main image
    and transform sub-images (e.g. the palette table) are stored as.
    The meta-prefix bit exists ONLY for the level-0 spatially-coded
    image (libwebp gates it on allow_recursion): sub-images go straight
    from cache info to the prefix codes. ``meta_bits`` (level0 only,
    needs ``width``) writes a meta-prefix ENTROPY IMAGE: pixels are
    partitioned into ``1 << meta_bits`` tiles, tiles carry one of two
    prefix-code groups in a checkerboard ((tx + ty) % 2 — deterministic
    and guaranteed to switch groups mid-row, the case a reader must
    handle), and every token is coded by the group of its STARTING
    pixel; the color cache stays global across groups, per spec.

    For inputs of ``_VEC_MIN_PIXELS`` or more the token pipeline
    (tokenize → frequencies → emission → bit pack) runs vectorized
    (round 15, guide §4.2 "native code inside the UDF"); smaller inputs
    — transform sub-images, entropy images, thumbnails — keep the scalar
    loop, whose constant factor wins below the measured ~2k-pixel
    crossover. The two paths emit IDENTICAL bytes: left-runs are the
    maximal equal-value blocks minus their first element, split at 4096,
    and the color cache's slot for a key always holds the previous
    same-key token's value (copy/hit updates are no-ops: the slot
    already holds that value), so cache hits reduce to a stable
    groupwise shift comparison. Byte identity is pinned by tests over an
    image × parameter grid straddling the threshold."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_base = 256 + 24
    if len(vals) < _VEC_MIN_PIXELS:
        _emit_image_scalar(
            bw, vals, cache_bits, cache_size, green_base, use_lz77, level0,
            meta_bits, width,
        )
        return
    v = np.asarray(vals, dtype=np.int64)
    n = v.size

    # ---- tokenize: head tokens (literal/cache) + copy runs ----
    if n and use_lz77:
        is_head = np.empty(n, dtype=bool)
        is_head[0] = True
        np.not_equal(v[1:], v[:-1], out=is_head[1:])
        heads = np.flatnonzero(is_head)
        tails = np.diff(np.append(heads, n)) - 1  # repeats after each head
        hblk = np.flatnonzero(tails > 0)
        q, r = np.divmod(tails[hblk], 4096)
        counts = q + (r > 0)
        tot = int(counts.sum())
        blk = np.repeat(np.arange(hblk.size), counts)
        ordinal = np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        copy_len = np.where(ordinal < q[blk], 4096, r[blk])
        copy_pos = heads[hblk][blk] + 1 + 4096 * ordinal
    elif n:
        heads = np.arange(n, dtype=np.int64)
        copy_len = np.empty(0, dtype=np.int64)
        copy_pos = np.empty(0, dtype=np.int64)
    else:
        heads = copy_len = copy_pos = np.empty(0, dtype=np.int64)
    hv = v[heads]

    # ---- classify heads: cache hit ⟺ the previous same-key head holds
    # the same value (stable sort by key keeps index order per key) ----
    if cache_size and heads.size:
        hkey = (
            (hv.astype(np.uint64) * np.uint64(_CACHE_MUL))
            & np.uint64(0xFFFFFFFF)
        ) >> np.uint64(32 - cache_bits)
        hkey = hkey.astype(np.int64)
        order = np.argsort(hkey, kind="stable")
        ks, vs = hkey[order], hv[order]
        hit_sorted = np.empty(heads.size, dtype=bool)
        hit_sorted[0] = False
        hit_sorted[1:] = (ks[1:] == ks[:-1]) & (vs[1:] == vs[:-1])
        hit = np.empty(heads.size, dtype=bool)
        hit[order] = hit_sorted
    else:
        hkey = np.zeros(heads.size, dtype=np.int64)
        hit = np.zeros(heads.size, dtype=bool)

    csym = _LZ_SYM_TAB[copy_len]
    cextra = _LZ_EXTRA_TAB[copy_len]
    cbits = _LZ_EBITS_TAB[copy_len]
    dsym, dextra, dnb = _lz_symbol(_DIST_MAP_INDEX[(1, 0)])

    if meta_bits is not None:
        if not level0 or width is None:
            raise ValueError("meta-prefix needs level0 and an image width")
        tiles_w = (width + (1 << meta_bits) - 1) >> meta_bits
        tiles_h = ((n // width) + (1 << meta_bits) - 1) >> meta_bits
        ty, tx = np.meshgrid(
            np.arange(tiles_h), np.arange(tiles_w), indexing="ij"
        )
        tile_groups_arr = ((tx + ty) % 2).ravel()
        tile_groups = [int(g) for g in tile_groups_arr]
        n_groups = int(tile_groups_arr.max()) + 1

        def group_of_vec(pos: np.ndarray) -> np.ndarray:
            return tile_groups_arr[
                ((pos // width) >> meta_bits) * tiles_w
                + ((pos % width) >> meta_bits)
            ]
    else:
        n_groups = 1

        def group_of_vec(pos: np.ndarray) -> np.ndarray:
            return np.zeros(pos.size, dtype=np.int64)

    g_head = group_of_vec(heads)
    g_copy = group_of_vec(copy_pos)

    ha = (hv >> 24) & 0xFF
    hr = (hv >> 16) & 0xFF
    hg = (hv >> 8) & 0xFF
    hbl = hv & 0xFF
    lit = ~hit
    freqs = []
    for g in range(n_groups):
        mh = g_head == g
        m0 = mh & lit
        mc = g_copy == g
        f0 = np.zeros(green_base + cache_size, dtype=np.int64)
        f0[:256] = np.bincount(hg[m0], minlength=256)
        f0[256 : 256 + 24] = np.bincount(csym[mc], minlength=24)
        if cache_size:
            f0[green_base:] = np.bincount(hkey[mh & hit], minlength=cache_size)
        f4 = np.zeros(40, dtype=np.int64)
        f4[dsym] = int(mc.sum())
        freqs.append(
            [
                f0.tolist(),
                np.bincount(hr[m0], minlength=256).tolist(),
                np.bincount(hbl[m0], minlength=256).tolist(),
                np.bincount(ha[m0], minlength=256).tolist(),
                f4.tolist(),
            ]
        )

    group_lengths = [
        [_huffman_lengths(f, 15) for f in fq] for fq in freqs
    ]
    # Codebooks as (n_groups, alphabet) arrays of pre-reversed codes and
    # lengths — the emission below is pure fancy indexing (same bits on
    # the wire as the MSB-first tree-walk order).
    alphabets = (green_base + cache_size, 256, 256, 256, 40)
    gc_code = [np.zeros((n_groups, a), dtype=np.int64) for a in alphabets]
    gc_bits = [np.zeros((n_groups, a), dtype=np.int64) for a in alphabets]
    for gi, lengths in enumerate(group_lengths):
        for ci, l in enumerate(lengths):
            cb = _canonical_codes(l)
            if len(cb) == 1:  # single-symbol codes are read with 0 bits
                cb[next(iter(cb))] = (0, 0)
            for s, (c, nb) in cb.items():
                gc_code[ci][gi, s] = _rev_bits(c, nb)
                gc_bits[ci][gi, s] = nb

    if cache_size:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta_bits is not None:
            bw.write(1, 1)  # meta-prefix image follows
            bw.write(meta_bits - 2, 3)
            # entropy image: meta index = (red << 8) | green
            _emit_image(
                bw,
                [0xFF000000 | (g << 8) for g in tile_groups],
                0,
                True,
                level0=False,
            )
        else:
            bw.write(0, 1)  # no meta-prefix image
    for lengths in group_lengths:
        for l in lengths:
            _write_prefix_code(bw, l)

    # ---- vectorized emission: tokens in position order, each token's
    # fields contiguous (lit: g,r,b,a codes; copy: len code, len extra,
    # dist code, dist extra — zero-width fields are no-ops in write_many,
    # exactly like the scalar loop's skipped writes; cache: one code) ----
    n_head, n_copy = heads.size, copy_pos.size
    if n_head + n_copy == 0:
        return
    order = np.argsort(np.concatenate([heads, copy_pos]))
    t_copy = np.concatenate(
        [np.zeros(n_head, dtype=bool), np.ones(n_copy, dtype=bool)]
    )[order]
    t_hit = np.concatenate([hit, np.zeros(n_copy, dtype=bool)])[order]
    zc = np.zeros(n_copy, dtype=np.int64)
    zh = np.zeros(n_head, dtype=np.int64)
    t_grp = np.concatenate([g_head, g_copy])[order]
    t_g = np.concatenate([hg, zc])[order]
    t_r = np.concatenate([hr, zc])[order]
    t_b = np.concatenate([hbl, zc])[order]
    t_a = np.concatenate([ha, zc])[order]
    t_key = np.concatenate([hkey, zc])[order]
    t_csym = np.concatenate([zh, csym])[order]
    t_cextra = np.concatenate([zh, cextra])[order]
    t_cbits = np.concatenate([zh, cbits])[order]

    fcount = np.where(t_hit, 1, 4)
    base = np.cumsum(fcount) - fcount
    nfields = int(base[-1] + fcount[-1])
    fv = np.zeros(nfields, dtype=np.int64)
    fb = np.zeros(nfields, dtype=np.int64)

    mlit = ~t_copy & ~t_hit
    bl = base[mlit]
    gl = t_grp[mlit]
    fv[bl] = gc_code[0][gl, t_g[mlit]]
    fb[bl] = gc_bits[0][gl, t_g[mlit]]
    fv[bl + 1] = gc_code[1][gl, t_r[mlit]]
    fb[bl + 1] = gc_bits[1][gl, t_r[mlit]]
    fv[bl + 2] = gc_code[2][gl, t_b[mlit]]
    fb[bl + 2] = gc_bits[2][gl, t_b[mlit]]
    fv[bl + 3] = gc_code[3][gl, t_a[mlit]]
    fb[bl + 3] = gc_bits[3][gl, t_a[mlit]]

    bc = base[t_copy]
    gcp = t_grp[t_copy]
    fv[bc] = gc_code[0][gcp, 256 + t_csym[t_copy]]
    fb[bc] = gc_bits[0][gcp, 256 + t_csym[t_copy]]
    fv[bc + 1] = t_cextra[t_copy]
    fb[bc + 1] = t_cbits[t_copy]
    fv[bc + 2] = gc_code[4][gcp, dsym]
    fb[bc + 2] = gc_bits[4][gcp, dsym]
    fv[bc + 3] = dextra
    fb[bc + 3] = dnb

    bk = base[t_hit]
    gk = t_grp[t_hit]
    fv[bk] = gc_code[0][gk, green_base + t_key[t_hit]]
    fb[bk] = gc_bits[0][gk, green_base + t_key[t_hit]]

    bw.write_many(fv, fb)


def _s8(x):
    """Reinterpret the low byte as signed int8 (works elementwise on
    numpy arrays and plain ints — the cast both cross-color directions
    apply to green/red before the 3.5 fixed-point multiply)."""
    return ((x & 0xFF) ^ 0x80) - 0x80


# Candidate 3.5-fixed-point multipliers the encoder scores per tile
# (32 == subtract-green's exact effect: (32·g)>>5 == g).
_CC_CANDIDATES = (-64, -32, -16, 0, 16, 32, 64)


def _forward_cross_color(
    r: np.ndarray,
    g: np.ndarray,
    b: np.ndarray,
    size_bits: int,
    force: tuple[int, int, int] | None,
) -> tuple[list[int], np.ndarray, np.ndarray]:
    """Forward cross-color pass over the CURRENT image channels (int64
    h×w, possibly predictor residuals — cwebp applies cross-color after
    prediction): per tile pick (green_to_red, green_to_blue,
    red_to_blue) from the candidate grid by wraparound-residual cost
    (red and blue scored independently — red depends only on g2r; blue
    on the (g2b, r2b) pair, using the ORIGINAL red per spec), or use
    ``force``. Returns (packed ct sub-image row-major, new_red,
    new_blue). Vectorized; independent of the decoder's inverse."""
    h, w = r.shape
    g_s8, r_s8 = _s8(g), _s8(r)  # r_s8 from the ORIGINAL red (spec)

    def cost(p: np.ndarray) -> np.ndarray:
        return np.minimum(p, 256 - p)

    if force is not None:
        for v in force:
            if not -128 <= v <= 127:
                raise ValueError("cross-color multipliers must be int8")

    tiles_h = (h + (1 << size_bits) - 1) >> size_bits
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits

    def tile_sums(per_pixel: np.ndarray) -> np.ndarray:
        """Sum the trailing (h, w) axes of ``per_pixel`` per tile →
        (..., tiles_h, tiles_w), via one reduceat per axis — replaces
        the per-tile Python slicing loop (identical integer sums)."""
        row_starts = np.arange(tiles_h) << size_bits
        col_starts = np.arange(tiles_w) << size_bits
        s = np.add.reduceat(per_pixel, row_starts, axis=-2)
        return np.add.reduceat(s, col_starts, axis=-1)

    if force is not None:
        g2r_t = np.full((tiles_h, tiles_w), force[0], dtype=np.int64)
        g2b_t = np.full((tiles_h, tiles_w), force[1], dtype=np.int64)
        r2b_t = np.full((tiles_h, tiles_w), force[2], dtype=np.int64)
    else:
        cand = np.asarray(_CC_CANDIDATES, dtype=np.int64)
        d_g = (cand[:, None, None] * g_s8) >> 5  # (7, h, w)
        d_r = (cand[:, None, None] * r_s8) >> 5
        # Red: 7 candidate costs per tile; argmin keeps the FIRST minimum
        # in candidate order, matching the scalar min(key=...) tie-break.
        red_cube = tile_sums(cost((r - d_g) & 0xFF))  # (7, th, tw)
        g2r_t = cand[np.argmin(red_cube, axis=0)]
        # Blue: the (g2b, r2b) 49-combo grid as one cost cube, one g2b
        # slab at a time (bounds live memory at 7·h·w). The flattened
        # argmin's C order (tb-major, trb-minor) is exactly the old
        # nested-loop visit order, so first-minimum ties break the same.
        blue_cube = np.stack(
            [
                tile_sums(cost((b - dg_b[None, :, :] - d_r) & 0xFF))
                for dg_b in d_g
            ]
        ).reshape(49, tiles_h, tiles_w)
        flat = np.argmin(blue_cube, axis=0)
        g2b_t = cand[flat // 7]
        r2b_t = cand[flat % 7]

    cts = [
        int(0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF))
        for g2r, g2b, r2b in zip(g2r_t.ravel(), g2b_t.ravel(), r2b_t.ravel())
    ]
    # Per-pixel multiplier maps from the chosen tile grids (the inverse
    # transform's gather, run forward): same arithmetic as the per-tile
    # slice assignments they replace.
    ridx = np.arange(h) >> size_bits
    cidx = np.arange(w) >> size_bits
    g2r_m = g2r_t[ridx[:, None], cidx[None, :]]
    g2b_m = g2b_t[ridx[:, None], cidx[None, :]]
    r2b_m = r2b_t[ridx[:, None], cidx[None, :]]
    new_red = (r - ((g2r_m * g_s8) >> 5)) & 0xFF
    new_blue = (b - ((g2b_m * g_s8) >> 5) - ((r2b_m * r_s8) >> 5)) & 0xFF
    return cts, new_red, new_blue


def _apply_inverse_cross_color(
    argb: np.ndarray, cts: list[int], size_bits: int
) -> np.ndarray:
    """Inverse cross-color over a packed-ARGB (h, w) int64 image — pure
    per-pixel (no scan-order recurrence), fully vectorized: recover red
    from green, then blue from green and the RECOVERED red (int8 casts
    and arithmetic >>5 per spec / libwebp VP8LTransformColorInverse)."""
    h, w = argb.shape
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    tiles_h = (h + (1 << size_bits) - 1) >> size_bits
    tile_grid = np.asarray(cts, dtype=np.int64).reshape(tiles_h, tiles_w)
    tmap = tile_grid[
        (np.arange(h) >> size_bits)[:, None],
        (np.arange(w) >> size_bits)[None, :],
    ]
    g2r, g2b, r2b = _s8(tmap), _s8(tmap >> 8), _s8(tmap >> 16)
    g = _s8(argb >> 8)
    new_red = (((argb >> 16) & 0xFF) + ((g2r * g) >> 5)) & 0xFF
    new_blue = (
        (argb & 0xFF) + ((g2b * g) >> 5) + ((r2b * _s8(new_red)) >> 5)
    ) & 0xFF
    return (argb & ~0xFF00FF) | (new_red << 16) | new_blue


def _forward_predictor(
    planes: list[np.ndarray], size_bits: int, force_mode: int | None
) -> tuple[list[int], list[int]]:
    """Forward predictor pass over component planes [A, R, G, B] (int64
    h×w): pick a mode per tile (argmin of a wraparound-residual cost,
    or ``force_mode``), return (tile modes row-major, packed-ARGB
    residuals row-major). Fully vectorized — prediction at ENCODE time
    uses actual pixel values, so there is no sequential dependency;
    only the decoder's inverse is a scan-order recurrence. Implemented
    against per-plane numpy shifts, independently of the decoder's
    packed-int SWAR arithmetic."""
    h, w = planes[0].shape
    bs = 1 << size_bits

    def shifts(p: np.ndarray) -> tuple[np.ndarray, ...]:
        left = np.zeros_like(p)
        left[:, 1:] = p[:, :-1]
        top = np.zeros_like(p)
        top[1:, :] = p[:-1, :]
        tl = np.zeros_like(p)
        tl[1:, 1:] = p[:-1, :-1]
        tr = np.zeros_like(p)
        if w > 1:
            tr[1:, :-1] = p[:-1, 1:]
        tr[1:, w - 1] = p[1:, 0]  # rightmost column: leftmost of CURRENT row
        return left, top, tl, tr

    nb = [shifts(p) for p in planes]  # per component: (L, T, TL, TR)

    def avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return (a + b) >> 1

    # preds[mode][comp] -> (h, w) plane
    preds: list[list[np.ndarray]] = []
    black = [np.full((h, w), v, dtype=np.int64) for v in (255, 0, 0, 0)]
    preds.append(black)  # 0
    for pick in (0, 1, 3, 2):  # 1: L, 2: T, 3: TR, 4: TL
        preds.append([nb[c][pick] for c in range(4)])
    preds.append([avg2(avg2(nb[c][0], nb[c][3]), nb[c][1]) for c in range(4)])  # 5
    preds.append([avg2(nb[c][0], nb[c][2]) for c in range(4)])  # 6
    preds.append([avg2(nb[c][0], nb[c][1]) for c in range(4)])  # 7
    preds.append([avg2(nb[c][2], nb[c][1]) for c in range(4)])  # 8
    preds.append([avg2(nb[c][1], nb[c][3]) for c in range(4)])  # 9
    preds.append(
        [avg2(avg2(nb[c][0], nb[c][2]), avg2(nb[c][1], nb[c][3]))
         for c in range(4)]
    )  # 10
    p_l = sum(np.abs(nb[c][1] - nb[c][2]) for c in range(4))
    p_t = sum(np.abs(nb[c][0] - nb[c][2]) for c in range(4))
    sel = p_l < p_t
    preds.append([np.where(sel, nb[c][0], nb[c][1]) for c in range(4)])  # 11
    preds.append(
        [np.clip(nb[c][0] + nb[c][1] - nb[c][2], 0, 255) for c in range(4)]
    )  # 12
    half = []
    for c in range(4):
        ave = avg2(nb[c][0], nb[c][1])
        d = ave - nb[c][2]
        half.append(np.clip(ave + np.sign(d) * (np.abs(d) >> 1), 0, 255))
    preds.append(half)  # 13

    # Border overrides (identical across modes, so they never skew the
    # per-tile argmin): (0,0) black, rest of row 0 -> L, column 0 -> T.
    for mode_planes in preds:
        for c in range(4):
            if w > 1:
                mode_planes[c][0, 1:] = nb[c][0][0, 1:]
            if h > 1:
                mode_planes[c][1:, 0] = nb[c][1][1:, 0]
            mode_planes[c][0, 0] = 255 if c == 0 else 0

    resid_cube = np.empty((14, 4, h, w), dtype=np.int64)
    for m in range(14):
        for c in range(4):
            resid_cube[m, c] = (planes[c] - preds[m][c]) & 0xFF
    cost_cube = np.minimum(resid_cube, 256 - resid_cube).sum(axis=1)

    tiles_h = (h + bs - 1) >> size_bits
    tiles_w = (w + bs - 1) >> size_bits
    modes: list[int] = []
    chosen = np.empty((h, w), dtype=np.int64)
    for ty in range(tiles_h):
        ys = slice(ty << size_bits, min((ty + 1) << size_bits, h))
        for tx in range(tiles_w):
            xs = slice(tx << size_bits, min((tx + 1) << size_bits, w))
            if force_mode is not None:
                m = force_mode
            else:
                m = int(cost_cube[:, ys, xs].sum(axis=(1, 2)).argmin())
            modes.append(m)
            chosen[ys, xs] = m
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    picked = resid_cube[chosen, :, rows, cols]  # (h, w, 4)
    packed = (
        (picked[:, :, 0] << 24) | (picked[:, :, 1] << 16)
        | (picked[:, :, 2] << 8) | picked[:, :, 3]
    )
    return modes, packed.reshape(-1).tolist()


def _palette_width_bits(table_size: int) -> int:
    """Pixel bundling (RFC 9649 §4.2.4): tiny palettes pack several
    indices into one green byte — ≤2 colors: 8/px-byte, ≤4: 4, ≤16: 2."""
    if table_size <= 2:
        return 3
    if table_size <= 4:
        return 2
    if table_size <= 16:
        return 1
    return 0


def encode_webp(
    pixels: np.ndarray,
    subtract_green: bool = True,
    cache_bits: int = 0,
    use_lz77: bool = True,
    palette: bool = False,
    predictor: bool = False,
    predictor_block_bits: int = 4,
    cross_color: bool = False,
    cc_block_bits: int = 4,
    meta_prefix_bits: int | None = None,
    extended: bool = False,
    _force_predictor_mode: int | None = None,
    _force_cross_color: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as lossless WebP (VP8L in a
    RIFF/WEBP container). Alpha is written opaque. ``cache_bits`` > 0
    enables the color cache; ``use_lz77`` emits left-run copies (the
    cheap, always-correct subset of LZ77 — full windowed matching is an
    optimizer, not a correctness feature). ``palette`` writes the
    color-indexing transform instead — the layout cwebp picks for
    screenshots/charts, including pixel bundling for ≤16-color images;
    requires ≤256 distinct colors (quantize upstream, same contract as
    GIF) and supersedes ``subtract_green``. ``predictor`` writes the
    14-mode predictor transform (the layout cwebp picks for photo/
    texture content), per-tile argmin mode selection over
    ``1 << predictor_block_bits``-pixel tiles, composable with
    ``subtract_green`` in the same stream order cwebp uses;
    ``_force_predictor_mode`` pins every tile to one mode (conformance
    tests exercise each of the 14 this way). ``cross_color`` writes the
    cross-color transform (per-tile 3.5-fixed-point green→red,
    green→blue, red→blue multipliers scored from a candidate grid, or
    pinned by ``_force_cross_color``), applied AFTER prediction exactly
    as cwebp composes them. ``meta_prefix_bits`` (2..9) writes a
    meta-prefix entropy image: two prefix-code GROUPS in a per-tile
    checkerboard, every token coded by its starting pixel's group — the
    multi-histogram layout cwebp emits on virtually every image above
    thumbnail size. ``extended`` wraps the stream in a VP8X container
    with ICCP (before the image) and EXIF (after) metadata chunks — the
    layout cwebp emits whenever ``-metadata`` rides along; readers must
    hop both."""
    h, w, _ = pixels.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be 0..11")
    if (predictor or cross_color) and palette:
        raise ValueError(
            "predictor/cross-color and palette transforms don't compose"
        )
    if predictor and not 2 <= predictor_block_bits <= 9:
        raise ValueError("predictor_block_bits must be 2..9")
    if cross_color and not 2 <= cc_block_bits <= 9:
        raise ValueError("cc_block_bits must be 2..9")
    if meta_prefix_bits is not None and not 2 <= meta_prefix_bits <= 9:
        raise ValueError("meta_prefix_bits must be 2..9")
    px = pixels.astype(np.int64)

    bw = _BitWriter()
    bw.write(0x2F, 8)  # VP8L signature byte
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha-is-used hint
    bw.write(0, 3)  # version

    if palette:
        argb_img = (
            (0xFF << 24) | (px[:, :, 0] << 16) | (px[:, :, 1] << 8)
            | px[:, :, 2]
        )
        table = np.unique(argb_img.reshape(-1))
        if len(table) > 256:
            raise ValueError(
                f"VP8L color-indexing needs <=256 distinct colors, got "
                f"{len(table)}; quantize upstream (quantize_median_cut)"
            )
        bw.write(1, 1)  # a transform follows
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(table) - 1, 8)
        # The table rides INSIDE the transform data (before the
        # no-more-transforms bit) as a 1×N entropy image, component-wise
        # subtraction-coded against the previous entry.
        tl = table.tolist()
        deltas = [tl[0]] + [
            (
                ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
                | (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8)
                | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
            )
            for a, b in zip(tl[1:], tl[:-1])
        ]
        _emit_image(bw, deltas, 0, False, level0=False)
        bw.write(0, 1)  # no more transforms
        # Pack indices: width_bits indices per green byte, LSB-first.
        wb = _palette_width_bits(len(table))
        xs = 1 << wb
        bits_per = 8 >> wb
        lookup = {v: i for i, v in enumerate(tl)}
        idx = np.vectorize(lookup.__getitem__)(argb_img)
        sub_w = (w + xs - 1) // xs
        vals = []
        for y in range(h):
            for k in range(sub_w):
                byte = 0
                for j in range(min(xs, w - k * xs)):
                    byte |= int(idx[y, k * xs + j]) << (j * bits_per)
                vals.append((0xFF << 24) | (byte << 8))
        _emit_image(
            bw, vals, cache_bits, use_lz77, level0=True,
            meta_bits=meta_prefix_bits, width=sub_w,
        )
    else:
        g = px[:, :, 1]
        if subtract_green:
            r = (px[:, :, 0] - g) & 0xFF
            b = (px[:, :, 2] - g) & 0xFF
        else:
            r, b = px[:, :, 0], px[:, :, 2]
        a = np.full((h, w), 255, dtype=np.int64)
        if subtract_green:
            bw.write(1, 1)  # a transform follows
            bw.write(2, 2)  # SUBTRACT_GREEN
        if predictor:
            # Stream order matches cwebp: subtract-green header first,
            # then predictor, then cross-color — inverses run in
            # reverse read order, so the decoder undoes cross-color,
            # then prediction, then re-adds green.
            bw.write(1, 1)  # a transform follows
            bw.write(0, 2)  # PREDICTOR
            bw.write(predictor_block_bits - 2, 3)
            modes, resid = _forward_predictor(
                [a, r, g, b], predictor_block_bits, _force_predictor_mode
            )
            _emit_image(
                bw,
                [0xFF000000 | (m << 8) for m in modes],
                0,
                True,
                level0=False,
            )
            packed = np.array(resid, dtype=np.int64).reshape(h, w)
            a = (packed >> 24) & 0xFF
            r = (packed >> 16) & 0xFF
            g = (packed >> 8) & 0xFF
            b = packed & 0xFF
        if cross_color:
            bw.write(1, 1)  # a transform follows
            bw.write(1, 2)  # CROSS_COLOR
            bw.write(cc_block_bits - 2, 3)
            cts, r, b = _forward_cross_color(
                r, g, b, cc_block_bits, _force_cross_color
            )
            _emit_image(bw, cts, 0, True, level0=False)
        bw.write(0, 1)  # no more transforms
        vals = ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1).tolist()
        _emit_image(
            bw, vals, cache_bits, use_lz77, level0=True,
            meta_bits=meta_prefix_bits, width=w,
        )

    payload = bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) & 1 else b""
    )
    if extended:
        def chunk(cid: bytes, body: bytes) -> bytes:
            return cid + struct.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        # flags: ICC (0x20) + EXIF (0x08); canvas dims are minus-one,
        # 24-bit little-endian (WebP container spec).
        vp8x = chunk(
            b"VP8X",
            bytes([0x20 | 0x08]) + b"\x00\x00\x00"
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"),
        )
        iccp = chunk(b"ICCP", b"fake-icc-profile")
        exif = chunk(b"EXIF", b"Exif\x00\x00II*\x00\x08\x00\x00\x00")
        body = vp8x + iccp + vp8l + exif
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


# --------------------------------------------------------------------------- #
# Decoder
# --------------------------------------------------------------------------- #


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless-WebP payload to an (h, w, 3) uint8 RGB array.
    Covers the complete VP8L lossless feature set: simple/normal prefix
    codes, meta-prefix entropy images (per-tile prefix-code groups),
    color cache, LZ77 with 2D-mapped and plain distances, and all four
    transforms (subtract-green, 14-mode predictor, cross-color,
    color-indexing with pixel bundling), inverted in reverse read
    order. Still VP8L inside an extended (VP8X) container decodes too
    (metadata chunks hopped); lossy VP8 and ANIMATED WebP raise
    NotImplementedError (the pillow dispatch point)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WebP chunk {cid!r}")
        if cid == b"VP8L":
            vp8l = body
            break
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP needs pillow at this dispatch point"
            )
        if cid == b"VP8X":
            # Extended container: real cwebp output wraps the image
            # chunk in VP8X whenever metadata (EXIF/XMP/ICC) or alpha
            # rides along. A still VP8L inside decodes natively — keep
            # walking past the metadata chunks; only ANIMATION needs a
            # frame compositor (pillow).
            if size >= 1 and body[0] & 0x02:
                raise NotImplementedError(
                    "animated WebP needs pillow at this dispatch point"
                )
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("WebP contains no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms: list[tuple] = []  # in read order
    active_w = w
    seen_ttypes: set[int] = set()
    while br.read(1):  # transforms, in stream order
        ttype = br.read(2)
        if ttype in seen_ttypes:
            # RFC 9649: each transform may be used only once — a repeat
            # is a corrupt stream, and decoding it would silently apply
            # the inverse twice (fail loudly, quarantine class).
            raise ValueError(f"VP8L transform type {ttype} repeated")
        seen_ttypes.add(ttype)
        if ttype == 2:
            transforms.append(("sg",))
        elif ttype == 0:  # PREDICTOR
            size_bits = br.read(3) + 2
            tiles_w = (active_w + (1 << size_bits) - 1) >> size_bits
            tiles_h = (h + (1 << size_bits) - 1) >> size_bits
            sub = _read_image(br, tiles_w, tiles_h, level0=False)
            modes = [(v >> 8) & 0xFF for v in sub]
            bad = max(modes)
            if bad > 13:
                raise ValueError(f"VP8L predictor mode {bad} out of range")
            transforms.append(("pred", size_bits, modes))
        elif ttype == 1:  # CROSS_COLOR
            size_bits = br.read(3) + 2
            tiles_w = (active_w + (1 << size_bits) - 1) >> size_bits
            tiles_h = (h + (1 << size_bits) - 1) >> size_bits
            cts = _read_image(br, tiles_w, tiles_h, level0=False)
            transforms.append(("cc", size_bits, cts))
        elif ttype == 3:
            table_size = br.read(8) + 1
            deltas = _read_image(br, table_size, 1, level0=False)
            table = [deltas[0] & 0xFFFFFFFF]
            for d in deltas[1:]:
                p = table[-1]
                table.append(
                    ((((d >> 24) + (p >> 24)) & 0xFF) << 24)
                    | (((((d >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((d >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((d & 0xFF) + (p & 0xFF)) & 0xFF)
                )
            wb = _palette_width_bits(table_size)
            transforms.append(("pal", table, wb))
            active_w = (w + (1 << wb) - 1) >> wb
    out = _read_image(br, active_w, h, level0=True)
    argb = np.array(out, dtype=np.int64).reshape(h, active_w)
    # Inverse transforms run in REVERSE read order (RFC 9649 §4).
    for t in reversed(transforms):
        if t[0] == "pal":
            _, table, wb = t
            xs, bits_per = 1 << wb, 8 >> wb
            packed_green = (argb >> 8) & 0xFF
            cols = np.arange(w)
            idx = (
                packed_green[:, cols >> wb]
                >> ((cols & (xs - 1)) * bits_per)
            ) & ((1 << bits_per) - 1)
            if int(idx.max()) >= len(table):
                raise ValueError("VP8L palette index outside the color table")
            argb = np.array(table, dtype=np.int64)[idx]
        elif t[0] == "pred":
            _, size_bits, modes = t
            cur_h, cur_w = argb.shape
            actual = _apply_inverse_predictor(
                argb.reshape(-1).tolist(), modes, size_bits, cur_w, cur_h
            )
            argb = np.array(actual, dtype=np.int64).reshape(cur_h, cur_w)
        elif t[0] == "cc":
            _, size_bits, cts = t
            argb = _apply_inverse_cross_color(argb, cts, size_bits)
        else:  # subtract-green inverse
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & ~0xFFFFFF) | (r << 16) | (g << 8) | b
    if argb.shape != (h, w):
        raise ValueError("VP8L transform stack left a mis-sized image")
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    return np.ascontiguousarray(
        np.stack([r, g, b], axis=2).astype(np.uint8)
    )


def _read_tokens_table(
    br: _BitReader, w: int, h: int, cache_bits: int, cache_size: int,
    green_base: int, meta, groups,
) -> list[int]:
    """Token loop of :func:`_read_image` specialized to all-``_Table``
    code groups: bit-reader state lives in locals and every symbol read
    is an inlined fill → mask → lookup (the generic loop pays a Python
    call per symbol). Byte-for-byte the same decode and the same
    "truncated VP8L bitstream" contract — a symbol or extra-bits field
    raises exactly when it needs a bit past EOF."""
    data = br._data
    dlen = len(data)
    pos, acc, bits = br._pos, br._acc, br._n
    n = w * h
    out = [0] * n
    cache = [0] * cache_size
    key_shift = (32 - cache_bits) if cache_bits else 0
    mul = _CACHE_MUL
    if meta is not None:
        meta_bits, tiles_w, meta_idx = meta
    g0, g1, g2, g3, g4 = groups[0]
    i = 0
    while i < n:
        if meta is not None:
            g0, g1, g2, g3, g4 = groups[
                meta_idx[
                    ((i // w) >> meta_bits) * tiles_w + ((i % w) >> meta_bits)
                ]
            ]
        if g0.leaf is not None:
            sym = g0.leaf
        elif g0.nbits == 0:  # empty code — mirror the empty tree walk
            if bits == 0 and pos >= dlen:
                raise ValueError("truncated VP8L bitstream")
            raise ValueError("invalid VP8L prefix code path")
        else:
            tn = g0.nbits
            while bits < tn and pos < dlen:
                acc |= data[pos] << bits
                pos += 1
                bits += 8
            idx = acc & g0.mask
            ln = g0.lens[idx]
            if ln > bits:
                raise ValueError("truncated VP8L bitstream")
            acc >>= ln
            bits -= ln
            sym = g0.syms[idx]
        if sym < 256:
            if g1.leaf is not None:
                rr = g1.leaf
            elif g1.nbits == 0:  # empty code — mirror the empty tree walk
                if bits == 0 and pos >= dlen:
                    raise ValueError("truncated VP8L bitstream")
                raise ValueError("invalid VP8L prefix code path")
            else:
                tn = g1.nbits
                while bits < tn and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                idx = acc & g1.mask
                ln = g1.lens[idx]
                if ln > bits:
                    raise ValueError("truncated VP8L bitstream")
                acc >>= ln
                bits -= ln
                rr = g1.syms[idx]
            if g2.leaf is not None:
                bb = g2.leaf
            elif g2.nbits == 0:  # empty code — mirror the empty tree walk
                if bits == 0 and pos >= dlen:
                    raise ValueError("truncated VP8L bitstream")
                raise ValueError("invalid VP8L prefix code path")
            else:
                tn = g2.nbits
                while bits < tn and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                idx = acc & g2.mask
                ln = g2.lens[idx]
                if ln > bits:
                    raise ValueError("truncated VP8L bitstream")
                acc >>= ln
                bits -= ln
                bb = g2.syms[idx]
            if g3.leaf is not None:
                aa = g3.leaf
            elif g3.nbits == 0:  # empty code — mirror the empty tree walk
                if bits == 0 and pos >= dlen:
                    raise ValueError("truncated VP8L bitstream")
                raise ValueError("invalid VP8L prefix code path")
            else:
                tn = g3.nbits
                while bits < tn and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                idx = acc & g3.mask
                ln = g3.lens[idx]
                if ln > bits:
                    raise ValueError("truncated VP8L bitstream")
                acc >>= ln
                bits -= ln
                aa = g3.syms[idx]
            v = (aa << 24) | (rr << 16) | (sym << 8) | bb
            out[i] = v
            if cache_size:
                cache[((v * mul) & 0xFFFFFFFF) >> key_shift] = v
            i += 1
        elif sym < green_base:
            ls = sym - 256
            if ls < 4:
                length = ls + 1
            else:
                eb = (ls - 2) >> 1
                while bits < eb and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                if eb > bits:
                    raise ValueError("truncated VP8L bitstream")
                length = ((2 + (ls & 1)) << eb) + (acc & ((1 << eb) - 1)) + 1
                acc >>= eb
                bits -= eb
            if g4.leaf is not None:
                dsym = g4.leaf
            elif g4.nbits == 0:  # empty code — mirror the empty tree walk
                if bits == 0 and pos >= dlen:
                    raise ValueError("truncated VP8L bitstream")
                raise ValueError("invalid VP8L prefix code path")
            else:
                tn = g4.nbits
                while bits < tn and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                idx = acc & g4.mask
                ln = g4.lens[idx]
                if ln > bits:
                    raise ValueError("truncated VP8L bitstream")
                acc >>= ln
                bits -= ln
                dsym = g4.syms[idx]
            if dsym < 4:
                dcode = dsym + 1
            else:
                eb = (dsym - 2) >> 1
                while bits < eb and pos < dlen:
                    acc |= data[pos] << bits
                    pos += 1
                    bits += 8
                if eb > bits:
                    raise ValueError("truncated VP8L bitstream")
                dcode = ((2 + (dsym & 1)) << eb) + (acc & ((1 << eb) - 1)) + 1
                acc >>= eb
                bits -= eb
            dist = _map_distance(dcode, w)
            if dist > i:
                raise ValueError("VP8L backward reference before image start")
            if i + length > n:
                raise ValueError("VP8L copy runs past the image")
            if cache_size:
                for _ in range(length):
                    v = out[i - dist]
                    out[i] = v
                    cache[((v * mul) & 0xFFFFFFFF) >> key_shift] = v
                    i += 1
            else:
                for _ in range(length):
                    out[i] = out[i - dist]
                    i += 1
        else:
            out[i] = cache[sym - green_base]
            i += 1
    br._pos, br._acc, br._n = pos, acc, bits
    return out


def _read_image(br: _BitReader, w: int, h: int, level0: bool) -> list[int]:
    """Read one entropy-coded ARGB image stream (the unit both the main
    image and transform sub-images are stored as) → row-major ARGB ints.
    Only the level-0 spatially-coded image carries the meta-prefix bit
    (libwebp gates it on allow_recursion); transform sub-images go
    straight from cache info to the prefix codes. Meta-prefix ON reads
    the entropy sub-image (meta index = (red << 8) | green per tile) and
    one 5-code group per index; each token is decoded with the group of
    its starting pixel, while the color cache stays global."""
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    n_groups = 1
    if level0 and br.read(1):  # meta-prefix image present
        meta_bits = br.read(3) + 2
        tiles_w = (w + (1 << meta_bits) - 1) >> meta_bits
        tiles_h = (h + (1 << meta_bits) - 1) >> meta_bits
        entropy = _read_image(br, tiles_w, tiles_h, level0=False)
        meta_idx = [
            (((v >> 16) & 0xFF) << 8) | ((v >> 8) & 0xFF) for v in entropy
        ]
        n_groups = max(meta_idx) + 1
        meta = (meta_bits, tiles_w, meta_idx)
    green_base = 256 + 24
    groups = [
        (
            _read_prefix_code(br, green_base + cache_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        )
        for _ in range(n_groups)
    ]

    if all(type(t) is _Table for grp in groups for t in grp):
        # Every code is a flat table (Kraft-complete — all self-encoded
        # and valid external streams): run the token loop with the bit
        # state in locals and the table lookups inlined, which removes
        # one Python call per symbol (~4 per literal pixel, the measured
        # majority of photo-sized decode). Identical bytes-in/pixels-out
        # and identical truncation errors; streams carrying malformed
        # (incomplete/over-subscribed) codes still build _Tree decoders
        # and take the generic loop below with its exact error behavior.
        return _read_tokens_table(
            br, w, h, cache_bits, cache_size, green_base, meta, groups
        )

    n = w * h
    out = [0] * n
    cache = [0] * cache_size
    i = 0
    trees = groups[0]
    while i < n:
        if meta is not None:
            meta_bits, tiles_w, meta_idx = meta
            trees = groups[
                meta_idx[
                    ((i // w) >> meta_bits) * tiles_w + ((i % w) >> meta_bits)
                ]
            ]
        sym = _read_symbol(br, trees[0])
        if sym < 256:
            rr = _read_symbol(br, trees[1])
            bb = _read_symbol(br, trees[2])
            aa = _read_symbol(br, trees[3])
            v = (aa << 24) | (rr << 16) | (sym << 8) | bb
            out[i] = v
            if cache_size:
                cache[_cache_key(v, cache_bits)] = v
            i += 1
        elif sym < green_base:
            length = _lz_value(br, sym - 256)
            dsym = _read_symbol(br, trees[4])
            dist = _map_distance(_lz_value(br, dsym), w)
            if dist > i:
                raise ValueError("VP8L backward reference before image start")
            if i + length > n:
                raise ValueError("VP8L copy runs past the image")
            for _ in range(length):
                v = out[i - dist]
                out[i] = v
                if cache_size:
                    cache[_cache_key(v, cache_bits)] = v
                i += 1
        else:
            out[i] = cache[sym - green_base]
            i += 1
    return out
