"""MP3 (MPEG-1/2/2.5 Layer III) frame-header walker — audio triage.

Same role as ``operators/mp4.py`` for video: the first pass over an
audio corpus is duration/bitrate/sample-rate triage, not decoding.
``parse_mp3_metadata`` skips an ID3v2 tag (syncsafe size), then walks
the frame headers — 11-bit sync, version/layer bits, the per-version
Layer III bitrate and sample-rate tables (ISO 11172-3 for MPEG-1,
ISO 13818-3 for MPEG-2, the de-facto 2.5 extension for the low rates
voice/podcast corpora actually carry), padding — advancing by the
computed frame length (144·br/sr for MPEG-1, 72·br/sr for MPEG-2/2.5,
+ padding); no audio data is ever decoded. Duration falls out as
frames × samples-per-frame (1152 vs 576). ``build_mp3`` writes
structurally real frames (correct headers, zeroed payload), so the
``mp3_metadata_catalog`` registry query certifies the writer+parser
pair cross-engine from integer doc_id arithmetic.

Layers I/II raise NotImplementedError (a genuinely absent framing
grammar), and full Layer-III DECODE (huffman + IMDCT + synthesis
filterbank) is out of scope — on a pillow-less/ffmpeg-less cluster
that path raises, matching the loud-fallback contract of the codec
family; G.711 and PCM WAV (operators/multimodal.py) are the built-in
audio decode tiers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

# Layer III tables, keyed by version string. MPEG-2 and 2.5 share the
# bitrate table; sample rates halve (2) and quarter (2.5) the MPEG-1 set.
_BITRATES_KBPS = {
    "1": (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    "2": (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    "2.5": (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATE_TABLES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_SAMPLE_RATES = _SAMPLE_RATE_TABLES["1"]  # MPEG-1 alias (fixture cycling)
# header version bits (b1 >> 3) & 3: 00=2.5, 01=reserved, 10=2, 11=1
_VERSION_BITS = {"1": 0b11, "2": 0b10, "2.5": 0b00}
_VERSION_FROM_BITS = {0b11: "1", 0b10: "2", 0b00: "2.5"}
# Layer III: 1152 samples/frame in MPEG-1, 576 in MPEG-2/2.5 (and the
# slot coefficient 144 = spf/8 follows).
_SAMPLES_PER_FRAME = {"1": 1152, "2": 576, "2.5": 576}


def _frame_header(
    bitrate_kbps: int, sample_rate: int, padding: int, version: str
) -> bytes:
    bi = _BITRATES_KBPS[version].index(bitrate_kbps)
    si = _SAMPLE_RATE_TABLES[version].index(sample_rate)
    b0 = 0xFF
    # sync(3 high bits of b1) | version(2) | Layer III (01) | no CRC (1)
    b1 = 0xE0 | (_VERSION_BITS[version] << 3) | (0b01 << 1) | 1
    b2 = (bi << 4) | (si << 2) | (padding << 1)
    b3 = 0b01000100  # joint stereo, no ext, not copyrighted, original
    return bytes((b0, b1, b2, b3))


def _frame_length(
    bitrate_kbps: int, sample_rate: int, padding: int, version: str
) -> int:
    slots = _SAMPLES_PER_FRAME[version] // 8  # 144 or 72
    return slots * bitrate_kbps * 1000 // sample_rate + padding


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3_size: int = 0,
    version: str = "1",
) -> bytes:
    """Structurally real CBR MP3: optional ID3v2 tag (syncsafe size),
    then ``n_frames`` correct Layer-III frame headers with zeroed
    payload bytes. ``version`` in {"1", "2", "2.5"} picks the header
    version bits and the matching bitrate/sample-rate tables."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            (id3_size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"\x00" * id3_size
    flen = _frame_length(bitrate_kbps, sample_rate, 0, version)
    frame = _frame_header(bitrate_kbps, sample_rate, 0, version) + b"\x00" * (
        flen - 4
    )
    out += frame * n_frames
    return bytes(out)


def parse_mp3_metadata(payload: bytes) -> dict:
    """Triage metadata: MPEG version ("1"/"2"/"2.5"), frame count,
    duration, sample rate, bitrate (CBR value or the byte-weighted
    average for VBR), total audio bytes. Raises ValueError on bad sync,
    reserved table indices, mid-stream version/rate changes, or a frame
    running past the payload — corrupt blobs quarantine loudly; Layers
    I/II raise NotImplementedError (the external-demuxer boundary)."""
    pos = 0
    n = len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 size bytes must be syncsafe")
            size = (size << 7) | b
        pos = 10 + size
    n_frames = 0
    total_bytes = 0
    bitrate_bytes = 0
    sample_rate = None
    version = None
    while pos < n:
        if n - pos < 4:
            raise ValueError("trailing garbage shorter than an MP3 header")
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at offset {pos}")
        vbits = (b1 >> 3) & 0x03
        if vbits == 0b01:
            raise ValueError("reserved MPEG version bits in MP3 header")
        if (b1 >> 1) & 0x03 != 0b01:
            raise NotImplementedError(
                "only Layer III framing is built in; Layers I/II need an "
                "external demuxer"
            )
        ver = _VERSION_FROM_BITS[vbits]
        bi = (b2 >> 4) & 0x0F
        si = (b2 >> 2) & 0x03
        if bi in (0, 15) or si == 3:
            raise ValueError("reserved MP3 bitrate/sample-rate index")
        bitrate = _BITRATES_KBPS[ver][bi]
        rate = _SAMPLE_RATE_TABLES[ver][si]
        if version is None:
            version, sample_rate = ver, rate
        elif ver != version:
            raise ValueError("MPEG version changes mid-stream")
        elif rate != sample_rate:
            raise ValueError("MP3 sample rate changes mid-stream")
        flen = _frame_length(bitrate, rate, (b2 >> 1) & 1, ver)
        if pos + flen > n:
            raise ValueError("MP3 frame runs past the end of the payload")
        n_frames += 1
        total_bytes += flen
        bitrate_bytes += bitrate * flen
        pos += flen
    if n_frames == 0:
        raise ValueError("MP3 payload contains no frames")
    return {
        "mpeg_version": version,
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * _SAMPLES_PER_FRAME[version] * 1000
        // sample_rate,
        "bitrate_kbps": bitrate_bytes // total_bytes,
        "total_audio_bytes": total_bytes,
    }


MP3_META_SCHEMA = (
    "doc_id long, mpeg_version string, n_frames long, duration_ms long, "
    "sample_rate long, bitrate_kbps long, total_audio_bytes long"
)


def mp3_metadata(payloads: DataFrame) -> DataFrame:
    """(doc_id, mpeg_version, n_frames, duration_ms, sample_rate,
    bitrate_kbps, total_audio_bytes) per MP3 blob — Arrow-batched header
    walk, no audio decode (the triage property: cost is frames ×
    header-hop, independent of what the frames contain)."""

    def _parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows: dict = {k: [] for k in (
                "doc_id", "mpeg_version", "n_frames", "duration_ms",
                "sample_rate", "bitrate_kbps", "total_audio_bytes",
            )}
            for doc_id, payload in zip(
                batch.column("doc_id").to_pylist(), batch.column("payload")
            ):
                m = parse_mp3_metadata(payload.as_py())
                rows["doc_id"].append(doc_id)
                rows["mpeg_version"].append(m["mpeg_version"])
                rows["n_frames"].append(m["n_frames"])
                rows["duration_ms"].append(m["duration_ms"])
                rows["sample_rate"].append(m["sample_rate"])
                rows["bitrate_kbps"].append(m["bitrate_kbps"])
                rows["total_audio_bytes"].append(m["total_audio_bytes"])
            yield pa.RecordBatch.from_pydict(
                {
                    k: pa.array(
                        v, pa.string() if k == "mpeg_version" else pa.int64()
                    )
                    for k, v in rows.items()
                }
            )

    return payloads.mapInArrow(_parse, schema=MP3_META_SCHEMA)


def attach_fake_mp3_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a structurally real CBR MP3 per row from integer doc_id
    arithmetic (SQL-replayable): 40 + id % 80 frames, ID3v2 tag of
    id % 50 bytes; id % 7 < 5 → MPEG-1 (bitrate {96,128,192}, the 44.1k
    table), == 5 → MPEG-2 (bitrate {48,64,80}, the 22.05k table),
    == 6 → MPEG-2.5 (same bitrates, the 11.025k table) — the
    low-sample-rate framing voice/podcast corpora actually carry."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                vsel = d % 7
                version = "1" if vsel < 5 else ("2" if vsel == 5 else "2.5")
                bitrate = (
                    (96, 128, 192)[d % 3] if vsel < 5 else (48, 64, 80)[d % 3]
                )
                payloads.append(
                    build_mp3(
                        n_frames=40 + d % 80,
                        bitrate_kbps=bitrate,
                        sample_rate=_SAMPLE_RATE_TABLES[version][d % 3],
                        id3_size=d % 50,
                        version=version,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _encode,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )
