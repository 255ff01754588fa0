"""Pure-stdlib baseline JPEG codec — the no-dependency fallback tier for
``decode_image``.

Real ITU-T.81 baseline sequential JPEG: ``decode_jpeg`` handles 8-bit
huffman-coded SOF0 streams (1 or 3 components, any sampling factors in
{1,2}×{1,2} — 4:4:4 / 4:2:2 / 4:2:0, restart intervals, JFIF/EXIF APPn
segments), ``encode_jpeg`` writes 4:4:4 baseline with the Annex K example
tables, so any JPEG reader opens its output. Progressive (SOF2),
arithmetic coding, 12-bit precision, and hierarchical streams raise
``NotImplementedError`` — on pillow-present clusters ``decode_image``
never routes here (libjpeg is orders of magnitude faster), so this tier
exists to make the JPEG plumbing real and testable in a bare sandbox, the
same role the pure-Python PNG unfilter plays.

Determinism caveat (unlike the lossless PNG/BMP paths): the JPEG spec
licenses small IDCT implementation variance, so pixel values from this
decoder and libjpeg's can differ by ±1-2 LSB on the same payload. Decode
is deterministic WITHIN an environment; downstream perceptual features
(dHash over 9×8 box averages) are stable to this variance by
construction. Mirrors the role of the reference's opaque-media handling
(/root/reference/ stores media as bytes and never decodes in-engine).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------- #
# Shared constants (ITU-T.81 Annex K example tables — the de-facto standard).
# --------------------------------------------------------------------------- #

# fmt: off
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)
# fmt: on

# Huffman table specs: (BITS counts per code length 1..16, HUFFVAL symbols).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> np.ndarray:
    """The 64 zigzag positions as (row, col) — generated, not transcribed
    (diagonal d=r+c: even diagonals walk up-right, odd walk down-left)."""
    order = []
    for d in range(15):
        rng = range(min(d, 7), max(0, d - 7) - 1, -1) if d % 2 == 0 else range(
            max(0, d - 7), min(d, 7) + 1
        )
        for r in rng:
            order.append((r, d - r))
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # block[zz_flat[i]] = i-th zigzag coef

# Orthonormal DCT-II basis — identical to the T.81 FDCT/IDCT definition.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical huffman code assignment (T.81 C.2): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling (public convention)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------- #
# Encoder — baseline sequential, 4:4:4, Annex K tables.
# --------------------------------------------------------------------------- #


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category ssss, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(
    w: _BitWriter, coef: np.ndarray, pred: int, dc_tbl: dict, ac_tbl: dict
) -> int:
    zz = coef.reshape(-1)[_ZZ_FLAT]
    ssss, bits = _magnitude(int(zz[0]) - pred)
    length, code = dc_tbl[ssss]
    w.write(code, length)
    if ssss:
        w.write(bits, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                length, code = ac_tbl[0x00]  # EOB
                w.write(code, length)
                break
            run += 1
            if run == 16:
                length, code = ac_tbl[0xF0]  # ZRL
                w.write(code, length)
                run = 0
            continue
        ssss, bits = _magnitude(v)
        length, code = ac_tbl[(run << 4) | ssss]
        w.write(code, length)
        w.write(bits, ssss)
        run = 0
    return int(zz[0])


def _pad_plane(p: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad to a multiple of ``mult`` in both axes."""
    h, w = p.shape
    ph = (h + mult - 1) // mult * mult
    pw = (w + mult - 1) // mult * mult
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a REAL baseline JPEG (JFIF,
    Annex K huffman tables, quality-scaled Annex K quant tables) — any
    JPEG reader opens it. ``subsampling`` is ``"4:4:4"`` or ``"4:2:0"``
    (2×2 box-averaged chroma — the real-world camera/pillow default
    layout, exercising the decoder's interleaved-MCU + upsample path);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience layout long scans carry in the wild)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w, _ = pixels.shape
    qt = [_quality_scale(_QT_LUMA, quality), _quality_scale(_QT_CHROMA, quality)]

    rgb = pixels.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    sub = subsampling == "4:2:0"
    mcu = 16 if sub else 8
    yp = _pad_plane(y, mcu) - 128.0
    if sub:
        cbp = _pad_plane(cb, mcu)
        crp = _pad_plane(cr, mcu)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        ) - 128.0
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        ) - 128.0
    else:
        cbp = _pad_plane(cb, 8) - 128.0
        crp = _pad_plane(cr, 8) - 128.0

    dc_tbls = [
        _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tbls = [
        _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]

    def enc_block(bw, plane, by, bx, tsel, pred):
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        f = _DCT @ block @ _DCT.T
        coef = np.round(f / qt[tsel]).astype(np.int64)
        return _encode_block(bw, coef, pred, dc_tbls[tsel], ac_tbls[tsel])

    bw = _BitWriter()
    mcuy, mcux = yp.shape[0] // mcu, yp.shape[1] // mcu
    preds = [0, 0, 0]
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            if sub:
                for vy in range(2):
                    for vx in range(2):
                        preds[0] = enc_block(
                            bw, yp, my * 2 + vy, mx * 2 + vx, 0, preds[0]
                        )
            else:
                preds[0] = enc_block(bw, yp, my, mx, 0, preds[0])
            preds[1] = enc_block(bw, cbp, my, mx, 1, preds[1])
            preds[2] = enc_block(bw, crp, my, mx, 1, preds[2])
            mcu_i += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(-1)[_ZZ_FLAT]
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in zz))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    y_samp = 0x22 if sub else 0x11
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qt[0])
        + dqt(1, qt[1])
        + sof
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + dri
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------- #
# Decoder — baseline sequential, arbitrary {1,2}-factor sampling, restarts.
# --------------------------------------------------------------------------- #


class _BitReader:
    """MSB-first reader over one entropy-coded segment (stuffed 0xFF00 → a
    literal 0xFF data byte)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy stream")
                self.pos += 1
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(bits: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return bits if bits >= (1 << (ssss - 1)) else bits - (1 << ssss) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array — pure
    stdlib + numpy. Grayscale streams replicate Y into all three channels.
    Progressive/arithmetic/12-bit streams raise NotImplementedError (the
    pillow dispatch point in ``decode_image``)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "built-in JPEG decode covers baseline sequential (SOF0); "
                "progressive/arithmetic/hierarchical streams need pillow"
            )
        if marker == 0xD9:  # EOI before SOS
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # standalone markers
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            raise ValueError("truncated or malformed JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables need pillow")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ_FLAT] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                qts[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            if frame is not None and ns < len(frame["comps"]):
                # Baseline multi-scan (one scan per component) is legal
                # SOF0; decoding only the first scan would silently emit
                # zeroed planes for the rest — refuse loudly so the
                # pillow dispatch handles it like progressive streams.
                raise NotImplementedError(
                    "multi-scan baseline JPEG needs pillow"
                )
            scan = []
            for ci in range(ns):
                cid, tsel = body[1 + ci * 2], body[2 + ci * 2]
                scan.append({"id": cid, "dc": tsel >> 4, "ac": tsel & 0x0F})
            data_start = pos + 2 + seglen
            return _decode_scan(
                payload, data_start, frame, scan, qts, huff, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("truncated JPEG: no SOS marker")


def _decode_scan(payload, start, frame, scan, qts, huff, ri):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    fh, fw, comps = frame["h"], frame["w"], frame["comps"]
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise NotImplementedError("sampling factors beyond 2x2 need pillow")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)

    # Split the entropy stream at restart markers; stuffed FF00 stays.
    end = start
    segments_bounds = []
    seg_start = start
    while end + 1 < len(payload):
        if payload[end] == 0xFF:
            nxt = payload[end + 1]
            if nxt == 0x00:
                end += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments_bounds.append((seg_start, end))
                end += 2
                seg_start = end
                continue
            segments_bounds.append((seg_start, end))  # EOI or next marker
            break
        end += 1
    else:
        segments_bounds.append((seg_start, len(payload)))

    by_id = {c["id"]: c for c in comps}
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in comps
    }
    order = [by_id[s["id"]] for s in scan]
    tbl_for = {s["id"]: s for s in scan}

    mcu_index = 0
    seg_i = 0
    reader = _BitReader(payload[segments_bounds[0][0] : segments_bounds[0][1]])
    preds = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_index and mcu_index % ri == 0:
                seg_i += 1
                if seg_i >= len(segments_bounds):
                    raise ValueError("JPEG restart interval past data end")
                lo, hi = segments_bounds[seg_i]
                reader = _BitReader(payload[lo:hi])
                preds = {c["id"]: 0 for c in comps}
            for comp in order:
                sel = tbl_for[comp["id"]]
                dc_tbl = huff.get((0, sel["dc"]))
                ac_tbl = huff.get((1, sel["ac"]))
                qt = qts.get(comp["tq"])
                if dc_tbl is None or ac_tbl is None or qt is None:
                    raise ValueError("JPEG scan references a missing table")
                for vy in range(comp["v"]):
                    for vx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(ssss), ssss)
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[_ZZ_FLAT] = zz
                        f = block.reshape(8, 8) * qt
                        px = _DCT.T @ f @ _DCT + 128.0
                        y0 = (my * comp["v"] + vy) * 8
                        x0 = (mx * comp["h"] + vx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1

    # Upsample each component to full MCU-grid resolution, then crop.
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.ascontiguousarray(
            np.dstack([y, y, y]).astype(np.uint8)
        )
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.dstack([r, g, b])
    return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255).astype(np.uint8))
