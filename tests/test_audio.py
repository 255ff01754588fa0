"""Tests for the WAV codec and audio feature extraction."""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    audio_features,
    decode_wav,
    encode_wav,
)


def _sine(freq, seconds, rate=16000, amp=0.5):
    t = np.arange(int(seconds * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_lossless_int16():
    x = (np.array([0, 1000, -1000, 32767, -32768])).astype(np.int16)
    samples, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(samples, x)


def test_wav_float_encode_and_chunk_walking():
    payload = encode_wav(_sine(440, 0.1))
    # Inject a LIST chunk between fmt and data (real encoders do this) —
    # the decoder must walk past it.
    import struct

    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    samples, rate = decode_wav(patched)
    assert rate == 16000 and len(samples) == 1600


def test_non_pcm_raises_at_dispatch_point():
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 3, 2, 44100, 44100 * 8, 8, 32,
        b"data", 0,
    )
    with pytest.raises(NotImplementedError):
        decode_wav(hdr)


def test_audio_features_physics(spark):
    rate = 16000
    clips = {
        0: _sine(440, 0.5),               # tone
        1: np.zeros(rate // 2),           # silence
        2: _sine(100, 1.0, amp=0.999),    # loud low tone
    }
    rows = [(i, bytearray(encode_wav(x, rate))) for i, x in clips.items()]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert got[0]["duration_ms"] == 500 and got[0]["sample_rate"] == rate
    # 440 Hz for 0.5 s crosses zero ~2·440·0.5 times.
    assert abs(got[0]["zero_crossings"] - 440) <= 2
    assert got[1]["rms"] == 0.0 and got[1]["peak"] == 0  # silence gate signal
    # Louder clip → higher rms; sine rms ≈ amp/√2 in int16 units.
    assert got[2]["rms"] > got[0]["rms"]
    assert abs(got[2]["rms"] - 0.999 * 32767 / np.sqrt(2)) / 32767 < 0.01


def test_decode_audio_dispatch_and_soundfile_backend():
    """decode_audio routes RIFF/WAVE to the stdlib PCM16 codec; other
    containers go to soundfile when installed (multichannel folded to mono)
    or fail loudly when not — meaningful and green under both backends."""
    import numpy as np
    import pytest

    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    x = np.array([0.0, 0.5, -0.5, 1.0], dtype=np.float64)
    samples, rate = decode_audio(encode_wav(x, 8000))
    assert rate == 8000 and samples.dtype == np.int16
    try:
        import soundfile as sf  # noqa: F401

        has_sf = True
    except ImportError:
        has_sf = False
    if not has_sf:
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"fLaC" + b"\x00" * 16)
        return
    import io

    buf = io.BytesIO()
    sf.write(buf, np.stack([x, x], axis=1), 8000, format="FLAC")
    mono, r2 = decode_audio(buf.getvalue())
    assert r2 == 8000 and len(mono) == len(x)


# --------------------------------------------------------------------------- #
# G.711 telephony codecs (µ-law fmt 7 / A-law fmt 6)
# --------------------------------------------------------------------------- #


def test_g711_codeword_idempotence_over_full_int16_domain():
    """compress(expand(compress(x))) == compress(x) for every int16 —
    except µ-law's ±0: codewords 0x7F and 0xFF both decode to 0 (a real
    G.711 property), so x ∈ {-1,-2,-3} requantizes from negative zero to
    positive zero. A-law has no ±0 collision and is exactly stable."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _ALAW_EXPAND,
        _MULAW_EXPAND,
        alaw_compress,
        mulaw_compress,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    cm = mulaw_compress(x)
    cm2 = mulaw_compress(_MULAW_EXPAND[cm])
    unstable = np.nonzero(cm2 != cm)[0]
    assert set(cm[unstable]) <= {0x7F} and set(cm2[unstable]) <= {0xFF}
    ca = alaw_compress(x)
    assert np.array_equal(alaw_compress(_ALAW_EXPAND[ca]), ca)


def test_g711_anchor_values_and_error_bounds():
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _ALAW_EXPAND,
        _MULAW_EXPAND,
        mulaw_compress,
    )

    # Spec anchors: silence is 0xFF, full-scale positive is 0x80 (µ-law).
    assert mulaw_compress(np.array([0], dtype=np.int16))[0] == 0xFF
    assert mulaw_compress(np.array([32124], dtype=np.int16))[0] == 0x80
    assert _MULAW_EXPAND[0x80] == 32124 and _MULAW_EXPAND[0xFF] == 0
    # Companding is ~constant RELATIVE error: ≤ ~3.4% above the first
    # segment for both laws (absolute error grows with amplitude).
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        alaw_compress,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    for comp, table in (
        (mulaw_compress, _MULAW_EXPAND),
        (alaw_compress, _ALAW_EXPAND),
    ):
        d = table[comp(x)].astype(np.int64)
        rel = np.abs(d - x.astype(np.int64)) / np.maximum(
            np.abs(x.astype(np.int64)), 1
        )
        assert rel[np.abs(x.astype(np.int64)) > 1000].max() < 0.04


@pytest.mark.parametrize("law,fmt_tag", [("mulaw", 7), ("alaw", 6)])
def test_g711_wav_roundtrip_and_spec_shape(law, fmt_tag):
    """The WAV layer: fmt tag 6/7, 18-byte fmt chunk, required fact
    chunk, decode dispatch through the expand tables."""
    import struct

    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _ALAW_EXPAND,
        _MULAW_EXPAND,
        alaw_compress,
        decode_wav,
        encode_wav_g711,
        mulaw_compress,
    )

    i = np.arange(501, dtype=np.int64)
    s = (((i * 31 + 7 * i * i) % 4001) - 2000).astype(np.int16)
    blob = encode_wav_g711(s, 8000, law)
    assert blob[20:22] == struct.pack("<H", fmt_tag)
    assert b"fact" in blob
    assert len(blob) % 2 == 0  # odd data chunk is padded
    out, rate = decode_wav(blob)
    comp = mulaw_compress if law == "mulaw" else alaw_compress
    table = _MULAW_EXPAND if law == "mulaw" else _ALAW_EXPAND
    assert rate == 8000 and np.array_equal(out, table[comp(s)])
    assert np.abs(out.astype(np.int64) - s.astype(np.int64)).max() <= 64


def test_wav_data_before_fmt_raises():
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        decode_wav,
    )

    bad = b"RIFF" + (12).to_bytes(4, "little") + b"WAVE" + b"data" + (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="before the fmt"):
        decode_wav(bad)


# --------------------------------------------------------------------------- #
# Round 15: frame-energy fingerprint + audio near-dup
# --------------------------------------------------------------------------- #


def test_audio_fingerprint_matches_independent_reference(spark):
    """The mapInArrow fingerprint vs a plain-python reference computed
    here from the same recurrence — frame assignment (i*64//n), integer
    energies, gradient-sign bit order."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_fake_wav_payloads,
        audio_fingerprint,
    )

    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    out = {
        r["doc_id"]: r["fingerprint"]
        for r in audio_fingerprint(attach_fake_wav_payloads(docs)).collect()
    }
    for d in range(30):
        n = 400 + d % 37
        e = [0] * 64
        for i in range(n):
            v = ((d * 31 + 7 * i * i + 13 * i) % 4001) - 2000
            e[(i * 64) // n] += v * v
        want = 0
        for f in range(63):
            if e[f + 1] > e[f]:
                want |= 1 << f
        assert out[d] == want, d


def test_audio_group_population_perturbs_only_last_window_bit(spark):
    """The planted population contract: group members differ from their
    rep by Hamming ≤ 1, and only bit 62 may move."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_fake_wav_payloads,
        audio_fingerprint,
    )

    docs = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in audio_fingerprint(
            attach_fake_wav_payloads(docs, group=4)
        ).collect()
    }
    for g in range(6):
        rep = fp[g * 4]
        for m in (1, 2, 3):
            diff = rep ^ fp[g * 4 + m]
            assert diff & ~(1 << 62) == 0, (g, m)


def test_audio_near_dup_pairs_pigeonhole_recall(spark):
    """The banded join must find every within-radius pair the brute force
    finds — on the planted group population that is all 6 within-group
    pairs per group."""
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_fake_wav_payloads,
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    docs = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    hashes = audio_fingerprint(attach_fake_wav_payloads(docs, group=4))
    got = {
        (r["a_id"], r["b_id"])
        for r in audio_near_dup_pairs(hashes).collect()
    }
    rows = {r["doc_id"]: r["fingerprint"] for r in hashes.collect()}
    want = {
        (a, b)
        for a in rows
        for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    assert got == want
    # every group contributes all its within-group pairs
    for g in range(6):
        for m1 in range(4):
            for m2 in range(m1 + 1, 4):
                assert (g * 4 + m1, g * 4 + m2) in got
