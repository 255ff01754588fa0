"""RIFF/AVI video container — the real-format leg of the video pipeline.

The synthetic length-prefixed container (operators/multimodal.py:
encode_video) certified the keyframe pipeline's plumbing; this module
makes the container REAL: ``encode_avi`` writes a spec-shaped AVI
(RIFF → LIST hdrl [avih, LIST strl [strh, strf]] → LIST movi → idx1)
that any media player opens, and ``decode_avi`` walks the same grammar
back, including the LIST 'rec ' frame grouping real muxers emit and the
word-alignment padding RIFF requires. Two codecs, both stdlib-only:

- ``"MJPG"`` — Motion JPEG, one baseline JPEG per frame ('00dc' chunks,
  operators/jpeg.py). The format webcams/capture cards actually produce.
  LOSSY: pixel values carry spec-licensed IDCT variance, so cross-engine
  certification is structural (frame count + dims replayed by SQL, the
  ``image_jpeg_decode_dims`` precedent) and pixel fidelity lives in
  pytest (dHash proximity to the lossless path).
- ``"DIB "`` — uncompressed bottom-up BGR frames ('00db' chunks,
  BI_RGB, the same row layout as BMP). LOSSLESS and bit-exact, so the
  full 64-bit pixel-replay dHash oracle certifies container walk +
  frame decode end-to-end (``video_keyframe_dhash_avi``).

Scale shape: identical to the synthetic container — payload bytes stay
inside Arrow-batched scan-side stages (mapInPandas encode, mapInArrow
hash); only (doc_id, frame_idx, 8-byte hash) rows ever cross an
exchange. Mirrors the reference's opaque-payload storage role
(/root/reference/ keeps media as bytes and never decodes in-engine;
here decode is a first-class executor-side path).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from .jpeg import encode_jpeg
from .multimodal import VIDEO_HASH_SCHEMA, decode_image, dhash64


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """One RIFF chunk: fourcc + u32 size + body + word-alignment pad
    (the pad byte is not counted in size — the detail sloppy parsers
    miss on odd-sized MJPEG frames)."""
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _dib_bits(px: np.ndarray) -> bytes:
    """Frame pixels → uncompressed DIB bits: bottom-up rows, BGR order,
    each row padded to a 4-byte boundary (the BMP pixel-array layout
    without BMP's file/info headers)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _dib_to_rgb(body: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise ValueError("AVI DIB frame shorter than its geometry")
    rows = np.frombuffer(body, dtype=np.uint8, count=h * stride).reshape(
        h, stride
    )
    return np.ascontiguousarray(
        rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    )


def encode_avi(
    frames: list[np.ndarray],
    codec: str = "MJPG",
    fps: int = 25,
    quality: int = 90,
) -> bytes:
    """Pack (h, w, 3) uint8 RGB frames into a real AVI payload. All
    frames must share one geometry (an AVI stream has a single strf
    header — real muxers enforce the same). ``codec`` is ``"MJPG"``
    (baseline JPEG per frame, 4:2:0 — the layout capture hardware
    writes) or ``"DIB "`` (uncompressed, lossless). An idx1 index is
    emitted with per-frame offsets, as real writers do."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all AVI frames must share one geometry")
    if codec == "MJPG":
        ckid = b"00dc"
        bodies = [
            encode_jpeg(f, quality=quality, subsampling="4:2:0")
            for f in frames
        ]
        compression = struct.unpack("<I", b"MJPG")[0]
    elif codec == "DIB ":
        ckid = b"00db"
        bodies = [_dib_bits(f) for f in frames]
        compression = 0  # BI_RGB
    else:
        raise ValueError("codec must be 'MJPG' or 'DIB '")

    max_body = max(len(b) for b in bodies)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_body * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_body,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"DIB ")
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate = frame rate
            0,  # dwStart
            len(frames),  # dwLength
            max_body,  # dwSuggestedBufferSize
            10_000,  # dwQuality
            0,  # dwSampleSize (0: one sample per chunk)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression,
        max_body, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for body in bodies:
        # idx1 offsets are measured from the 'movi' fourcc (the common
        # convention real demuxers expect); first chunk sits at +4.
        idx += ckid + struct.pack("<III", 0x10, 4 + len(movi_body), len(body))
        movi_body += _chunk(ckid, body)
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> list[np.ndarray]:
    """Walk a RIFF/AVI payload and decode its video frames to (h, w, 3)
    uint8 RGB arrays, in stream order. Handles 'rec ' frame-group LISTs,
    word-alignment padding, and both built-in codecs; other compressions
    raise NotImplementedError (the PyAV/ffmpeg dispatch point), malformed
    structure raises ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("AVI RIFF size runs past the end of the payload")

    dims: tuple[int, int] | None = None
    compression: int | None = None
    frames: list[np.ndarray] = []

    def walk(start: int, end: int, in_movi: bool) -> None:
        nonlocal dims, compression
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_start + size,
                    in_movi or ltype in (b"movi", b"rec "),
                )
            elif cid == b"strf":
                bi_w, bi_h = struct.unpack_from("<ii", payload, body_start + 4)
                if bi_h < 0:
                    raise NotImplementedError(
                        "top-down DIB AVI needs an external decoder"
                    )
                dims = (bi_w, bi_h)
                (compression,) = struct.unpack_from(
                    "<I", payload, body_start + 16
                )
            elif in_movi and cid[2:4] == b"dc":
                if compression is None:
                    # Mirror the '00db' branch: a frame before strf is a
                    # MALFORMED file (quarantine class), not a foreign
                    # codec (external-decoder class).
                    raise ValueError("AVI frame before the strf header")
                if compression != struct.unpack("<I", b"MJPG")[0]:
                    raise NotImplementedError(
                        "only MJPG compressed AVI streams are built in; "
                        "other codecs need PyAV/ffmpeg at this dispatch "
                        "point"
                    )
                frames.append(
                    decode_image(payload[body_start : body_start + size])
                )
            elif in_movi and cid[2:4] == b"db":
                if dims is None:
                    raise ValueError("AVI frame before the strf header")
                frames.append(
                    _dib_to_rgb(
                        payload[body_start : body_start + size], *dims
                    )
                )
            pos = body_start + size + (size & 1)

    walk(12, 8 + riff_size, False)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


# --------------------------------------------------------------------------- #
# Spark stages
# --------------------------------------------------------------------------- #


def attach_fake_avi_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    codec: str = "DIB ",
    quality: int = 90,
) -> DataFrame:
    """Synthesize a real AVI per row from the SAME textured frames as the
    synthetic container (multimodal.py:_textured_frame_pixels — 4 + id % 5
    frames, geometry keyed on the id), so the two container paths are
    directly comparable frame-for-frame and the DIB leg shares the
    synthetic leg's pixel-replay oracle unchanged."""
    from .multimodal import _textured_frame_pixels

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 4 + d % 5
                payloads.append(
                    encode_avi(
                        [_textured_frame_pixels(d, f) for f in range(n)],
                        codec=codec,
                        quality=quality,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _encode,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def avi_keyframe_dhash(payloads: DataFrame, stride: int = 2) -> DataFrame:
    """(doc_id, frame_idx, dhash) for every ``stride``-th frame of each
    AVI payload — the real-container twin of multimodal.py:
    video_keyframe_dhash, same output schema, so everything downstream
    (video_near_dup_pairs, the banded hamming join) composes unchanged."""

    def _hash(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(
                batch.column("doc_id").to_pylist(), batch.column("payload")
            ):
                frames = decode_avi(payload.as_py())
                for f in range(0, len(frames), stride):
                    ids.append(doc_id)
                    idxs.append(f)
                    hashes.append(np.int64(np.uint64(dhash64(frames[f]))))
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(idxs, pa.int64()),
                    "dhash": pa.array(hashes, pa.int64()),
                }
            )

    return payloads.mapInArrow(_hash, schema=VIDEO_HASH_SCHEMA)


AVI_STRUCTURE_SCHEMA = (
    "doc_id long, n_frames long, img_width long, img_height long"
)


def avi_video_structure(payloads: DataFrame) -> DataFrame:
    """(doc_id, n_frames, img_width, img_height) per AVI — the structural
    certification surface for the LOSSY MJPEG leg: frame count and
    geometry survive JPEG byte-exactly even though pixel values carry
    IDCT variance (the image_jpeg_decode_dims oracle split)."""

    def _shape(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, nf, ws, hs = [], [], [], []
            for doc_id, payload in zip(
                batch.column("doc_id").to_pylist(), batch.column("payload")
            ):
                frames = decode_avi(payload.as_py())
                ids.append(doc_id)
                nf.append(len(frames))
                hs.append(frames[0].shape[0])
                ws.append(frames[0].shape[1])
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_frames": pa.array(nf, pa.int64()),
                    "img_width": pa.array(ws, pa.int64()),
                    "img_height": pa.array(hs, pa.int64()),
                }
            )

    return payloads.mapInArrow(_shape, schema=AVI_STRUCTURE_SCHEMA)
