"""MP4 / ISO Base Media File Format (ISO 14496-12) metadata extraction.

A 100-TB video-curation pipeline's FIRST pass over an MP4 corpus is not
decoding — it is metadata triage: duration, resolution, codec, track
layout, sample counts, so length/aspect/codec gates can drop most bytes
before any decoder runs. This module does that pass with a pure-stdlib
box walker: ``parse_mp4_metadata`` hops the size+fourcc box grammar
(including 64-bit largesize and version-1 full boxes), descends the
container boxes (moov/trak/mdia/minf/stbl/dinf), and reads mvhd/tkhd/
mdhd/hdlr/stsd/stsz — no frame ever touched. ``build_mp4`` writes a
structurally real minimal MP4 (ftyp + full moov tree + mdat) that any
box inspector opens, so the writer+parser pair is certifiable
cross-engine: the ``mp4_metadata_catalog`` registry query synthesizes
per-document MP4s from integer doc_id arithmetic and the DuckDB oracle
replays every extracted field.

Sample DATA decode (H.264 etc.) is out of scope by design — the honest
NotImplementedError boundary the codec family draws everywhere; the
metadata layer is the part that must scale to every blob.

Mirrors the reference's opaque-media storage role (/root/reference/
keeps payloads as bytes) — triage metadata is what its ingest layer
would need first at video scale.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def build_mp4(
    duration_units: int,
    timescale: int,
    width: int,
    height: int,
    n_samples: int,
    codec: str = "avc1",
    payload: bytes = b"",
    audio_first: bool = False,
    edit_entries: list[tuple[int, int]] | None = None,
) -> bytes:
    """A structurally real minimal MP4: ftyp + moov (mvhd, one video trak
    with the full mdia/minf/stbl tree) + mdat. Times are version-0
    (32-bit); width/height ride both tkhd (16.16 fixed) and the stsd
    visual sample entry, as real muxers write them. ``audio_first``
    prepends a complete 'soun' trak (mp4a sample entry, its OWN sample
    count) BEFORE the video trak — the common real-muxer layout whose
    stsd bytes at the visual width/height offsets are the audio
    sample-rate field, so a parser that doesn't gate on hdlr reports
    garbage. ``edit_entries`` writes an edts/elst (version 0) in the
    video trak: (segment_duration in movie timescale, media_time) pairs,
    media_time −1 being an empty (leader-trim) edit."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration_units)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _full(
        b"tkhd", 0, 3,  # enabled | in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration_units)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration_units)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    sample_entry = (
        struct.pack(">I", 86) + codec.encode("ascii")
        + b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">III", 1, n_samples, max(1, duration_units // max(1, n_samples))),
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1))
    per_sample = max(1, len(payload) // max(1, n_samples))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_samples)
        + struct.pack(f">{n_samples}I", *([per_sample] * n_samples)),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    edts = b""
    if edit_entries:
        elst = _full(
            b"elst", 0, 0,
            struct.pack(">I", len(edit_entries))
            + b"".join(
                struct.pack(">IiHH", seg_dur, media_time, 1, 0)
                for seg_dur, media_time in edit_entries
            ),
        )
        edts = _box(b"edts", elst)
    trak = _box(b"trak", tkhd + edts + mdia)
    if audio_first:
        # A complete 'soun' trak FIRST: mp4a sample entry (whose bytes at
        # the visual width/height offsets are the 16.16 sample rate) and
        # its own stsz count — none of which may leak into video fields.
        a_hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"soun" + b"\x00" * 12
            + b"SoundHandler\x00",
        )
        a_entry = (
            struct.pack(">I", 36) + b"mp4a"
            + b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
            + b"\x00" * 8
            + struct.pack(">HHHH", 2, 16, 0, 0)  # channels, bits, pre, rsv
            + struct.pack(">I", 44100 << 16)
        )
        a_stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + a_entry)
        a_n = n_samples + 7
        a_stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, a_n) + struct.pack(f">{a_n}I", *([1] * a_n)),
        )
        a_stts = _full(b"stts", 0, 0, struct.pack(">III", 1, a_n, 1))
        a_stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, a_n, 1))
        a_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
        smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        a_stbl = _box(b"stbl", a_stsd + a_stts + a_stsc + a_stsz + a_stco)
        a_minf = _box(b"minf", smhd + _box(b"dinf", dref) + a_stbl)
        a_mdia = _box(b"mdia", mdhd + a_hdlr + a_minf)
        trak = _box(b"trak", tkhd + a_mdia) + trak
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", payload)
    return ftyp + moov + mdat


def _walk_boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body_start = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body_start = pos + 16
        elif size == 0:
            size = end - pos
        if size < body_start - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, body_start, pos + size
        pos += size


def _full_header(data: bytes, start: int) -> tuple[int, int]:
    """(version, body offset past version+flags)."""
    return data[start], start + 4


def _parse_trak(payload: bytes, start: int, end: int) -> dict:
    """One trak subtree → its handler type, sample-entry fields, sample
    count, and edit list (elst v0/v1 (segment_duration, media_time)
    pairs) — per-track so the caller can gate on hdlr before trusting
    any stsd/stsz field."""
    info: dict = {
        "handler": None, "codec": None, "width": None, "height": None,
        "n_samples": None, "elst": None,
    }

    def walk(s: int, e: int) -> None:
        for btype, bs, be in _walk_boxes(payload, s, e):
            if btype == b"hdlr":
                _, off = _full_header(payload, bs)
                info["handler"] = payload[off + 4 : off + 8].decode(
                    "ascii", "replace"
                )
            elif btype == b"elst":
                ver, off = _full_header(payload, bs)
                (n_entries,) = struct.unpack_from(">I", payload, off)
                p = off + 4
                entries = []
                step = 20 if ver == 1 else 12
                for _ in range(n_entries):
                    # Bounds-check BEFORE unpacking: a truncated elst must
                    # raise the documented ValueError (quarantine class),
                    # not struct.error.
                    if p + step > be:
                        raise ValueError("MP4 elst overruns its box")
                    if ver == 1:
                        seg_dur, media_time = struct.unpack_from(
                            ">Qq", payload, p
                        )
                    else:
                        seg_dur, media_time = struct.unpack_from(
                            ">Ii", payload, p
                        )
                    p += step
                    entries.append((seg_dur, media_time))
                info["elst"] = entries
            elif btype == b"stsd" and info["codec"] is None:
                _, off = _full_header(payload, bs)
                (n_entries,) = struct.unpack_from(">I", payload, off)
                if n_entries >= 1:
                    entry_start = off + 4
                    info["codec"] = payload[
                        entry_start + 4 : entry_start + 8
                    ].decode("ascii", "replace")
                    w, h = struct.unpack_from(">HH", payload, entry_start + 32)
                    info["width"], info["height"] = w, h
            elif btype == b"stsz" and info["n_samples"] is None:
                _, off = _full_header(payload, bs)
                _fixed, count = struct.unpack_from(">II", payload, off)
                info["n_samples"] = count
            elif btype in _CONTAINERS:
                walk(bs, be)

    walk(start, end)
    return info


def parse_mp4_metadata(payload: bytes) -> dict:
    """Triage metadata from an MP4 blob: movie duration/timescale, track
    count, and — gated on each trak's hdlr handler_type, so an
    audio-first layout can't leak mp4a fields into video columns — the
    FIRST VIDEO track's handler, codec fourcc, pixel dimensions (from
    the sample entry), sample count, and edit list: ``has_edit_list``
    plus ``presentation_ms`` (sum of elst segment durations in movie
    timescale — the duration a player actually presents, vs the
    container duration; equal when no elst). Handles version-0 and
    version-1 time boxes and 64-bit box sizes. Raises ValueError on
    grammar violations — corrupt blobs must be quarantined loudly, not
    averaged into corpus stats."""
    meta = {
        "timescale": None, "duration_units": None, "n_tracks": 0,
        "handler": None, "codec": None, "width": None, "height": None,
        "n_samples": None,
    }
    saw_ftyp = False
    saw_moov = False
    traks: list[dict] = []

    for btype, bs, be in _walk_boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            saw_ftyp = True
        elif btype == b"moov":
            saw_moov = True
            for t2, b2, e2 in _walk_boxes(payload, bs, be):
                if t2 == b"mvhd":
                    ver, off = _full_header(payload, b2)
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", payload, off + 16)
                    else:
                        ts, dur = struct.unpack_from(">II", payload, off + 8)
                    meta["timescale"], meta["duration_units"] = ts, dur
                elif t2 == b"trak":
                    traks.append(_parse_trak(payload, b2, e2))

    if not saw_ftyp or not saw_moov:
        raise ValueError("not an ISO-BMFF payload (ftyp/moov missing)")
    if not meta["timescale"]:
        raise ValueError("MP4 moov carries no mvhd timescale")
    meta["n_tracks"] = len(traks)
    video = next((t for t in traks if t["handler"] == "vide"), None)
    if video is not None:
        meta["handler"] = video["handler"]
        meta["codec"] = video["codec"]
        meta["width"], meta["height"] = video["width"], video["height"]
        meta["n_samples"] = video["n_samples"]
    elif traks:
        meta["handler"] = traks[0]["handler"]
    meta["duration_ms"] = meta["duration_units"] * 1000 // meta["timescale"]
    elst = video["elst"] if video is not None else None
    meta["has_edit_list"] = bool(elst)
    pres_units = (
        sum(seg for seg, _ in elst) if elst else meta["duration_units"]
    )
    meta["presentation_ms"] = pres_units * 1000 // meta["timescale"]
    return meta


MP4_META_SCHEMA = (
    "doc_id long, duration_ms long, timescale long, n_tracks long, "
    "handler string, codec string, img_width long, img_height long, "
    "n_samples long, has_edit_list boolean, presentation_ms long"
)


def mp4_metadata(payloads: DataFrame) -> DataFrame:
    """(doc_id, duration_ms, timescale, n_tracks, handler, codec, width,
    height, n_samples, has_edit_list, presentation_ms) per MP4 blob —
    Arrow-batched, metadata-only (no sample data is ever decoded, so the
    per-blob cost is microseconds regardless of media size: the triage
    property that matters at 100 TB). Video fields come from the first
    hdlr=='vide' track only; presentation_ms replays the edit list so
    leader-trimmed files gate on what a player presents."""

    def _parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = {k: [] for k in (
                "doc_id", "duration_ms", "timescale", "n_tracks",
                "handler", "codec", "img_width", "img_height", "n_samples",
                "has_edit_list", "presentation_ms",
            )}
            for doc_id, payload in zip(
                batch.column("doc_id").to_pylist(), batch.column("payload")
            ):
                m = parse_mp4_metadata(payload.as_py())
                rows["doc_id"].append(doc_id)
                rows["duration_ms"].append(m["duration_ms"])
                rows["timescale"].append(m["timescale"])
                rows["n_tracks"].append(m["n_tracks"])
                rows["handler"].append(m["handler"])
                rows["codec"].append(m["codec"])
                rows["img_width"].append(m["width"])
                rows["img_height"].append(m["height"])
                rows["n_samples"].append(m["n_samples"])
                rows["has_edit_list"].append(m["has_edit_list"])
                rows["presentation_ms"].append(m["presentation_ms"])
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
                "timescale": pa.array(rows["timescale"], pa.int64()),
                "n_tracks": pa.array(rows["n_tracks"], pa.int64()),
                "handler": pa.array(rows["handler"], pa.string()),
                "codec": pa.array(rows["codec"], pa.string()),
                "img_width": pa.array(rows["img_width"], pa.int64()),
                "img_height": pa.array(rows["img_height"], pa.int64()),
                "n_samples": pa.array(rows["n_samples"], pa.int64()),
                "has_edit_list": pa.array(rows["has_edit_list"], pa.bool_()),
                "presentation_ms": pa.array(
                    rows["presentation_ms"], pa.int64()
                ),
            })

    return payloads.mapInArrow(_parse, schema=MP4_META_SCHEMA)


def attach_fake_mp4_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a structurally real MP4 per row from integer doc_id
    arithmetic (all fields SQL-replayable): timescale 600 + 300·(id%5),
    duration (2 + id%7)·timescale + id%13 units, 320+16·(id%8) ×
    240+16·(id%5) px, 24 + id%40 samples, codec cycling a real fourcc
    triple. id%4==1 rows get an AUDIO TRACK FIRST (mp4a, its own sample
    count — the layout that exposes un-gated stsd walks); id%5==2 rows
    get an edit list (an empty leader edit of 10 + id%50 units plus one
    full-duration media edit), so presentation > container duration."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    codecs = ("avc1", "hvc1", "vp09")

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                ts = 600 + 300 * (d % 5)
                dur = (2 + d % 7) * ts + d % 13
                edits = (
                    [(10 + d % 50, -1), (dur, 0)] if d % 5 == 2 else None
                )
                payloads.append(
                    build_mp4(
                        duration_units=dur,
                        timescale=ts,
                        width=320 + 16 * (d % 8),
                        height=240 + 16 * (d % 5),
                        n_samples=24 + d % 40,
                        codec=codecs[d % 3],
                        payload=b"\x00" * (d % 97),
                        audio_first=d % 4 == 1,
                        edit_entries=edits,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _encode,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )
