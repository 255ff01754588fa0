"""Unit tests for as-of join, SimHash, multimodal plumbing, language-ID."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.functions.text import predict_language, tokenize
from data_lake_medallion_architecture_project_spark.operators.asof import asof_join
from data_lake_medallion_architecture_project_spark.operators.dedup import simhash_near_dup
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    attach_text_payloads,
    decode_image,
    extract_payload_features,
)


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "key long, t long, tag string",
    ).select("key", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 10), (1, 18), (2, 99), (9, 1)], "key long, t long"
    ).select("key", F.timestamp_seconds("t").alias("ts"))
    out = {
        r["tag"]: r["asof_ts"]
        for r in asof_join(left, right, key="key", ts="ts").collect()
    }
    assert out["a"].timestamp() == 10  # equal ts counts (<=)
    assert out["b"].timestamp() == 18  # latest earlier right row
    assert out["c"] is None  # right row is later than left
    assert out["d"] is None  # no right rows for key


def test_simhash_identical_and_disjoint(spark):
    # Near-dup = small token-weight change on a longish doc (1 of 30 tokens)
    # flips 6 of the 64 signature bits; disjoint docs sit at distance ~28-30.
    # bands=8 (> max_hamming) keeps the pigeonhole recall guarantee.
    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(29)) + " other"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, "x y z w v u t s r q")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup(df, "doc_id", "text", max_hamming=6, bands=8).collect()
    }
    assert pairs[(0, 1)] == 0  # identical → distance 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 6  # near-identical → close
    assert not any({a, b} == {0, 3} for a, b in pairs)  # disjoint → far


def test_simhash_band_guards(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_near_dup(df, "doc_id", "text", max_hamming=6)  # bands=4 ≤ 6
    with pytest.raises(ValueError):
        simhash_near_dup(df, "doc_id", "text", max_hamming=3, bands=5)  # 5 ∤ 64


def test_bigram_udtf_lateral(spark):
    from data_lake_medallion_architecture_project_spark.plans.extensions import _BigramUDTF

    spark.udtf.register("bigrams_udtf_test", _BigramUDTF)
    spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, None), (4, "p q")], "doc_id long, text string"
    ).createOrReplaceTempView("__udtf_docs")
    rows = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT b.doc_id, b.bigram FROM __udtf_docs d, "
            "LATERAL bigrams_udtf_test(d.doc_id, d.text) b"
        ).collect()
    )
    # 1→N expansion: 2 bigrams for 3 tokens, none for 1 token or NULL text.
    assert rows == [(1, "a b"), (1, "b c"), (4, "p q")]


def test_bmp_codec_roundtrip():
    import numpy as np

    from data_lake_medallion_architecture_project_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    # Odd width exercises the 4-byte row padding.
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def _has_pillow() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_image_dispatch():
    import numpy as np

    from data_lake_medallion_architecture_project_spark.operators.multimodal import decode_image, encode_bmp

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert (decode_image(encode_bmp(px)) == px).all()
    # A truncated PNG fails loudly in the built-in decoder (round 11: PNG is
    # a stdlib codec, no pillow needed) — never silent.
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # JPEG has a built-in baseline codec since r13 — a malformed stream
    # fails loudly at the parse site (never silent, never fake pixels).
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(b"\xff\xd8\xff\xe0....")
    # Lossless WebP has a built-in codec since r14 — a malformed VP8L
    # stream fails loudly in it; formats with NO built-in codec (TIFF)
    # still dispatch to pillow or fail loudly naming it.
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 16)
    if not _has_pillow():
        with pytest.raises(NotImplementedError, match="pillow"):
            decode_image(b"II*\x00" + b"\x00" * 16)


def test_decode_image_png_backend_matches_bmp():
    """A PNG round-trip of the same pixels must decode to the identical RGB
    array the stdlib BMP path produces (so dHash and decode stats agree
    across formats). Since round 11 the PNG leg runs WITHOUT pillow (the
    built-in zlib codec); when pillow IS present, a pillow-WRITTEN PNG —
    whatever scanline filters its encoder picked — must also decode
    identically through the built-in decoder."""
    import io

    import numpy as np

    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_png(px)) == decode_image(encode_bmp(px))).all()
    if _has_pillow():  # pragma: no cover - sandbox has no pillow
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(px, "RGB").save(buf, format="PNG")  # lossless
        assert (decode_image(buf.getvalue()) == px).all()


def test_resize_nearest_matches_manual_gather():
    import numpy as np

    from data_lake_medallion_architecture_project_spark.operators.multimodal import resize_image

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    out = resize_image(px, 3, 4)
    assert out.shape == (4, 3, 3)
    for r in range(4):
        for c in range(3):
            assert (out[r, c] == px[(r * 10) // 4, (c * 6) // 3]).all()


def test_image_decode_stats_mapinarrow(spark):
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _fake_bmp_params,
        attach_fake_bmp_payloads,
        image_decode_stats,
    )

    df = spark.createDataFrame([(i,) for i in (0, 5, 100, 12345)], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in image_decode_stats(attach_fake_bmp_payloads(df)).collect()
    }
    for doc_id in (0, 5, 100, 12345):
        w, h, top, bottom = _fake_bmp_params(doc_id)
        r = rows[doc_id]
        assert (r["img_width"], r["img_height"]) == (w, h)
        assert r["mean_r"] == (top[0] + bottom[0]) / 2.0
        assert r["mean_g"] == (top[1] + bottom[1]) / 2.0
        assert r["mean_b"] == (top[2] + bottom[2]) / 2.0
    # Thumbnailing goes through the same decode: a two-tone image stays
    # two-tone under nearest-neighbor at even thumb height → same means.
    thumbed = {
        r["doc_id"]: r
        for r in image_decode_stats(
            attach_fake_bmp_payloads(df), thumb=(8, 8)
        ).collect()
    }
    for doc_id in (0, 5, 100, 12345):
        assert thumbed[doc_id]["mean_r"] == rows[doc_id]["mean_r"]


def test_multimodal_features_match_hashlib(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "héllo ünicode")], "doc_id long, text string"
    )
    feats = {
        r["doc_id"]: r
        for r in extract_payload_features(attach_text_payloads(df)).collect()
    }
    for doc_id, text in [(1, "hello world"), (2, "héllo ünicode")]:
        raw = text.encode("utf-8")
        assert feats[doc_id]["payload_len"] == len(raw)
        assert feats[doc_id]["payload_md5"] == hashlib.md5(raw).hexdigest()
        assert 1 <= feats[doc_id]["fake_width"] <= 1920
        assert feats[doc_id]["media_type"] == "text/plain"


def test_decode_image_fails_loudly_on_garbage():
    """A 3-byte JPEG-magic fragment is a truncated stream for the r13
    built-in baseline codec — loud parse-site failure, never fake pixels
    (this was a NotImplementedError stub check before the codec landed)."""
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff")


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "der hund ist nicht mit der katze im haus"),
            (3, "le chat est dans la maison avec le chien"),
            (4, "el perro es un animal y la casa es grande"),
            (5, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", predict_language(tokenize("text")).alias("lang")
        ).collect()
    }
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "unknown"


def test_approx_distinct_within_error(spark):
    from data_lake_medallion_architecture_project_spark.plans import REGISTRY

    rows = REGISTRY["approx_distinct_users"].build(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # The invariant column the oracle certifies: the HLL++ estimate
        # landed within 2% of the exact count (integer comparison).
        assert r["approx_within_2pct"] is True
        assert r["exact_users"] > 0


def test_bucketed_range_join_boundaries(spark):
    from data_lake_medallion_architecture_project_spark.operators.rangejoin import events_in_window_counts
    from pyspark.sql import functions as F

    anchors = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 05:00:00")],
        "event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    probes = spark.createDataFrame(
        [
            ("2024-01-01 00:30:00",),  # == anchor1 ts → inside (>=)
            ("2024-01-01 01:29:59",),  # inside, crosses the hour bucket
            ("2024-01-01 01:30:00",),  # exactly +1h → OUTSIDE (half-open)
            ("2024-01-01 04:59:59",),  # before anchor2 → outside
        ],
        "ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["n_in_window"]
        for r in events_in_window_counts(anchors, probes, "event_id").collect()
    }
    assert got == {1: 2, 2: 0}


def test_bucketed_range_join_exotic_column_name(spark):
    """ts column names with spaces/backticks must survive the F.expr path
    (_micros backtick-quotes the identifier for the NTZ branch)."""
    from data_lake_medallion_architecture_project_spark.operators.rangejoin import events_in_window_counts
    from pyspark.sql import functions as F

    weird = "event `time` stamp"
    anchors = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "event_id long, raw string"
    ).select("event_id", F.col("raw").cast("timestamp_ntz").alias(weird))
    probes = spark.createDataFrame(
        [("2024-01-01 00:45:00",), ("2024-01-01 02:00:00",)], "raw string"
    ).select(F.col("raw").cast("timestamp_ntz").alias(weird))
    got = {
        r["event_id"]: r["n_in_window"]
        for r in events_in_window_counts(anchors, probes, "event_id", ts_col=weird).collect()
    }
    assert got == {1: 1}


def test_bucketed_range_join_rejects_mixed_timestamp_types(spark):
    """NTZ anchors + zoned probes would sit on different epoch bases under a
    non-UTC session timezone; the operator must refuse up front."""
    import pytest
    from data_lake_medallion_architecture_project_spark.operators.rangejoin import events_in_window_counts
    from pyspark.sql import functions as F

    anchors = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "event_id long, raw string"
    ).select("event_id", F.col("raw").cast("timestamp_ntz").alias("ts"))
    probes = spark.createDataFrame(
        [("2024-01-01 00:45:00",)], "raw string"
    ).select(F.col("raw").cast("timestamp").alias("ts"))
    with pytest.raises(TypeError, match="same timestamp type"):
        events_in_window_counts(anchors, probes, "event_id")


def test_bm25_ranking_properties(spark):
    """BM25 sanity on a controlled corpus: a doc with more query-term hits
    outranks one with fewer (same length); between equal-tf docs the
    shorter one ranks higher (length normalization); docs without any
    query term are absent."""
    import os
    import tempfile

    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    rows = [
        (0, "spark spark spark pad pad pad pad pad"),        # tf=3, dl=8
        (1, "spark pad pad pad pad pad pad pad"),            # tf=1, dl=8
        (2, "spark pad"),                                    # tf=1, dl=2 (short)
        (3, "pad pad pad pad pad pad pad pad"),              # no hit
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("t").alias("source"), F.length("text").alias("n_chars"),
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in REGISTRY["bm25_search_docs"].build(spark, d).collect()
        }
    assert set(got) == {0, 1, 2}                      # doc 3 never surfaces
    assert all(r["n_terms_hit"] == 1 for r in got.values())
    assert got[0]["bm25"] > got[1]["bm25"]            # higher tf wins
    assert got[2]["bm25"] > got[1]["bm25"]            # shorter doc wins at tf=1


def test_cross_doc_ngram_overlap_controlled(spark):
    """Two docs sharing one 5-gram each report exactly one shared position;
    a doc with no cross-doc 5-gram reports zero."""
    import os
    import tempfile

    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, shared + " one two"),        # 7 tokens -> 3 grams; 1 shared
        (1, "x y " + shared),            # 7 tokens -> 3 grams; 1 shared
        (2, "p q r s t u v"),            # 7 tokens -> 3 grams; 0 shared
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("t").alias("source"), F.length("text").alias("n_chars"),
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in REGISTRY["cross_doc_ngram_overlap"].build(spark, d).collect()
        }
    assert got[0]["n_grams"] == 3 and got[0]["n_shared_grams"] == 1
    assert got[1]["n_grams"] == 3 and got[1]["n_shared_grams"] == 1
    assert got[2]["n_grams"] == 3 and got[2]["n_shared_grams"] == 0
    assert abs(got[0]["shared_fraction"] - 1 / 3) < 1e-12
