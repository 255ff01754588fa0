"""Multimodal column support — image/audio/video as opaque binary + metadata.

The pattern a 100 TB training-data pipeline needs: payloads travel as
``binary`` columns with typed metadata; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes stream executor-side in columnar
batches and never hit the driver.

The decode step itself is STUBBED: real image/audio libs are not available in
this environment, so ``extract_payload_features`` computes deterministic
byte-level features (length, digest, fake dimensions derived from the digest)
and ``decode_image`` raises ``NotImplementedError`` to mark the integration
point. The Spark-side plumbing — schema, batch iteration, Arrow binary round
trip, partition-parallel execution — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_len", LongType()),
        StructField("payload_md5", StringType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - explicit stub
    """Real decoder integration point (PIL/libvips/ffmpeg)."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; extract_payload_features uses deterministic byte-level "
        "features instead"
    )


def attach_text_payloads(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stand-in payload source: UTF-8 bytes of the text column as a binary
    payload with a media_type tag. Real pipelines read binary files or
    parquet BLOB columns the same way — the downstream plumbing is identical."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_payload_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake "decode": byte length, md5 digest, and pseudo
    width/height derived from the digest (the stub for real decoders).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(b).hexdigest() for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": [len(b) for b in pdf["payload"]],
                    "payload_md5": digests,
                    "fake_width": [int(d[:4], 16) % 1920 + 1 for d in digests],
                    "fake_height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
                }
            )

    return payloads.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(payloads: DataFrame, frame_size: int = 256, stride: int = 4) -> DataFrame:
    """Video-style frame sampling plumbing: one input payload row explodes to
    ~len/(frame_size·stride) output frame rows via ``mapInPandas`` (a 1→N
    Arrow-batched flatMap — the shape a real ffmpeg frame sampler needs).

    The "decode" is a deterministic stand-in: the payload is treated as a
    concatenation of ``frame_size``-byte frames and every ``stride``-th one is
    emitted. Swap the slicing loop for ffmpeg/PyAV keyframe extraction and
    nothing else changes — schema, batching, and partition parallelism are the
    real contract here."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_size)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": frames,
                    "frame_md5": [hashlib.md5(f).hexdigest() for f in frames],
                }
            )

    return payloads.mapInPandas(_sample, schema=FRAME_SCHEMA)


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover - explicit stub
    """Real resize integration point (PIL ``Image.resize`` / libvips
    ``thumbnail_buffer``); wire it through ``extract_payload_features``-style
    mapInPandas when an image library is present."""
    raise NotImplementedError(
        "image resizing requires an image library not present in this environment"
    )
