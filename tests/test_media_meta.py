"""Media-triage metadata walkers (operators/mp4.py, operators/mp3.py):
box/frame grammar roundtrips, version-1 and largesize boxes, ID3 skip,
VBR averaging, malformed-stream rejection, and the Spark stages."""

from __future__ import annotations

import struct

import pytest

from data_lake_medallion_architecture_project_spark.operators.mp3 import (
    _SAMPLE_RATES,
    attach_fake_mp3_payloads,
    build_mp3,
    mp3_metadata,
    parse_mp3_metadata,
)
from data_lake_medallion_architecture_project_spark.operators.mp4 import (
    attach_fake_mp4_payloads,
    build_mp4,
    mp4_metadata,
    parse_mp4_metadata,
)

# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_across_parameter_sweep():
    for d in range(40):
        ts = 600 + 300 * (d % 5)
        m = parse_mp4_metadata(
            build_mp4(
                duration_units=(2 + d % 7) * ts + d % 13,
                timescale=ts,
                width=320 + 16 * (d % 8),
                height=240 + 16 * (d % 5),
                n_samples=24 + d % 40,
                codec=("avc1", "hvc1", "vp09")[d % 3],
                payload=b"\x00" * (d % 97),
            )
        )
        assert m["duration_ms"] == ((2 + d % 7) * ts + d % 13) * 1000 // ts
        assert m["codec"] == ("avc1", "hvc1", "vp09")[d % 3]
        assert (m["width"], m["height"]) == (320 + 16 * (d % 8), 240 + 16 * (d % 5))
        assert m["n_samples"] == 24 + d % 40
        assert m["handler"] == "vide" and m["n_tracks"] == 1


def test_mp4_version1_mvhd_and_largesize_box():
    """Real muxers emit v1 (64-bit) time boxes past 2^32 units and
    largesize mdat past 4 GiB — both grammar features must parse. The
    v1 mvhd is hand-built; the largesize box wraps the same body with
    size=1 + u64."""
    blob = build_mp4(9000, 3000, 640, 480, 10)
    # splice a version-1 mvhd: locate v0 mvhd, rebuild body
    i = blob.find(b"mvhd") - 4
    (old_size,) = struct.unpack_from(">I", blob, i)
    v1_body = (
        struct.pack(">B3s", 1, b"\x00\x00\x00")
        + struct.pack(">QQIQ", 0, 0, 3000, 9000)
        + blob[i + 8 + 4 + 16 : i + old_size]  # rate..next_track_id tail
    )
    v1 = struct.pack(">I", 8 + len(v1_body)) + b"mvhd" + v1_body
    # moov/trak sizes change; simplest valid container: parse a standalone
    # stream of [ftyp][moov[mvhd_v1]] rebuilt from scratch
    ftyp = blob[: blob.find(b"moov") - 4]
    moov = struct.pack(">I", 8 + len(v1)) + b"moov" + v1
    m = parse_mp4_metadata(ftyp + moov)
    assert m["timescale"] == 3000 and m["duration_ms"] == 3000
    # largesize free box between ftyp and moov must be hopped over
    free_body = b"\x00" * 16
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16 + len(free_body)) + free_body
    m2 = parse_mp4_metadata(ftyp + free + moov)
    assert m2["duration_ms"] == 3000


def test_mp4_malformed_streams_fail_loudly():
    blob = build_mp4(6000, 600, 320, 240, 8)
    with pytest.raises(ValueError, match="ftyp/moov"):
        parse_mp4_metadata(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_metadata(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="timescale"):
        # moov without mvhd: strip it
        i = blob.find(b"mvhd") - 4
        (sz,) = struct.unpack_from(">I", blob, i)
        gutted = blob[:i] + blob[i + sz :]
        # fix moov size
        j = gutted.find(b"moov") - 4
        (msz,) = struct.unpack_from(">I", gutted, j)
        fixed = gutted[:j] + struct.pack(">I", msz - sz) + gutted[j + 4 :]
        parse_mp4_metadata(fixed)


def test_mp4_spark_stage_matches_formulas(spark):
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    out = {r["doc_id"]: r for r in mp4_metadata(
        attach_fake_mp4_payloads(docs)).collect()}
    for d in range(25):
        ts = 600 + 300 * (d % 5)
        dur = (2 + d % 7) * ts + d % 13
        r = out[d]
        assert r["duration_ms"] == dur * 1000 // ts
        assert r["codec"] == ("avc1", "hvc1", "vp09")[d % 3]
        assert r["n_samples"] == 24 + d % 40
        assert r["n_tracks"] == (2 if d % 4 == 1 else 1)
        assert r["handler"] == "vide"  # even when the audio trak is first
        assert r["has_edit_list"] == (d % 5 == 2)
        expected_pres = (dur + 10 + d % 50) if d % 5 == 2 else dur
        assert r["presentation_ms"] == expected_pres * 1000 // ts


def test_mp4_audio_track_first_never_leaks_into_video_fields():
    """ADVICE r14: an un-gated stsd walk on an audio-first MP4 reports
    the mp4a fourcc and reads the 16.16 sample-rate bytes as
    width/height. Fields must be gated on hdlr=='vide'."""
    m = parse_mp4_metadata(
        build_mp4(6000, 600, 352, 288, 8, codec="hvc1", audio_first=True)
    )
    assert m["n_tracks"] == 2
    assert m["handler"] == "vide"
    assert m["codec"] == "hvc1"
    assert (m["width"], m["height"]) == (352, 288)
    assert m["n_samples"] == 8  # not the audio trak's 15


def test_mp4_edit_list_presentation_duration():
    """A leader-trim edit list makes presentation ≠ container duration;
    both must be reported (the metadata-quality gate real MP4s hit)."""
    plain = parse_mp4_metadata(build_mp4(6000, 600, 320, 240, 8))
    assert not plain["has_edit_list"]
    assert plain["presentation_ms"] == plain["duration_ms"] == 10000
    m = parse_mp4_metadata(
        build_mp4(
            6000, 600, 320, 240, 8, edit_entries=[(90, -1), (6000, 0)]
        )
    )
    assert m["has_edit_list"]
    assert m["duration_ms"] == 10000
    assert m["presentation_ms"] == 6090 * 1000 // 600


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_roundtrip_and_id3_skip():
    for d in range(30):
        nf = 40 + d % 80
        br = (96, 128, 192)[d % 3]
        sr = _SAMPLE_RATES[d % 3]
        m = parse_mp3_metadata(build_mp3(nf, br, sr, id3_size=d % 50))
        assert m["n_frames"] == nf and m["sample_rate"] == sr
        assert m["duration_ms"] == nf * 1152 * 1000 // sr
        assert m["bitrate_kbps"] == br
        assert m["total_audio_bytes"] == nf * (144 * br * 1000 // sr)


def test_mp3_vbr_average_is_byte_weighted():
    vbr = build_mp3(10, 96, 44100) + build_mp3(10, 192, 44100)
    m = parse_mp3_metadata(vbr)
    assert m["n_frames"] == 20
    lo = 10 * (144 * 96 * 1000 // 44100)
    hi = 10 * (144 * 192 * 1000 // 44100)
    assert m["total_audio_bytes"] == lo + hi
    assert m["bitrate_kbps"] == (96 * lo + 192 * hi) // (lo + hi)


def test_mp3_malformed_and_unsupported_fail_loudly():
    with pytest.raises(ValueError, match="frame sync"):
        parse_mp3_metadata(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3_metadata(b"\xff\xfb\xf0\x44")  # bitrate index 15
    with pytest.raises(ValueError, match="runs past"):
        parse_mp3_metadata(build_mp3(3)[:-20])
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3_metadata(b"ID3\x04\x00\x00\x80\x00\x00\x00")
    layer2 = bytearray(build_mp3(1))
    layer2[1] = 0b11111101  # layer bits 10 = Layer II
    with pytest.raises(NotImplementedError, match="Layer"):
        parse_mp3_metadata(bytes(layer2))
    reserved_ver = bytearray(build_mp3(1))
    reserved_ver[1] = 0b11101011  # version bits 01 = reserved
    with pytest.raises(ValueError, match="reserved MPEG version"):
        parse_mp3_metadata(bytes(reserved_ver))
    with pytest.raises(ValueError, match="sample rate changes"):
        parse_mp3_metadata(build_mp3(2, 128, 44100) + build_mp3(2, 128, 48000))
    with pytest.raises(ValueError, match="version changes"):
        parse_mp3_metadata(
            build_mp3(2, 128, 44100)
            + build_mp3(2, 64, 22050, version="2")
        )


def test_mp3_mpeg2_and_25_roundtrip():
    """The low-sample-rate framings voice/podcast corpora carry: 576
    samples/frame, the 72·br/sr slot formula, the halved/quartered
    sample-rate tables, the low-rate bitrate table."""
    for version, rates in (("2", (22050, 24000, 16000)),
                           ("2.5", (11025, 12000, 8000))):
        for d in range(12):
            nf = 30 + d
            br = (48, 64, 80)[d % 3]
            sr = rates[d % 3]
            m = parse_mp3_metadata(
                build_mp3(nf, br, sr, id3_size=d % 20, version=version)
            )
            assert m["mpeg_version"] == version
            assert m["n_frames"] == nf and m["sample_rate"] == sr
            assert m["duration_ms"] == nf * 576 * 1000 // sr
            assert m["bitrate_kbps"] == br
            assert m["total_audio_bytes"] == nf * (72 * br * 1000 // sr)


def test_mp3_spark_stage_matches_formulas(spark):
    from data_lake_medallion_architecture_project_spark.operators.mp3 import (
        _SAMPLE_RATE_TABLES,
    )

    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    out = {r["doc_id"]: r for r in mp3_metadata(
        attach_fake_mp3_payloads(docs)).collect()}
    for d in range(25):
        vsel = d % 7
        version = "1" if vsel < 5 else ("2" if vsel == 5 else "2.5")
        sr = _SAMPLE_RATE_TABLES[version][d % 3]
        spf = 1152 if version == "1" else 576
        r = out[d]
        assert r["mpeg_version"] == version
        assert r["n_frames"] == 40 + d % 80
        assert r["duration_ms"] == (40 + d % 80) * spf * 1000 // sr
        expected_br = (
            (96, 128, 192)[d % 3] if vsel < 5 else (48, 64, 80)[d % 3]
        )
        assert r["bitrate_kbps"] == expected_br


def test_mp4_truncated_elst_raises_valueerror_not_struct_error():
    """Round-15 review finding: the elst bounds check ran AFTER
    struct.unpack_from, so a truncated edit list escaped the documented
    ValueError quarantine contract with struct.error."""
    blob = build_mp4(6000, 600, 320, 240, 8, edit_entries=[(60, -1)])
    i = blob.find(b"elst") - 4
    (sz,) = struct.unpack_from(">I", blob, i)
    # claim more entries than the box holds
    n_off = i + 8 + 4  # size+fourcc + version/flags
    forged = bytearray(blob)
    forged[n_off : n_off + 4] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="elst overruns"):
        parse_mp4_metadata(bytes(forged))
