"""WARC source support (sources/warc.py): record grammar, multi-member
gzip framing, sloppy-writer tolerance, strict byte accounting, and the
Spark write→read roundtrip against the certified registry surface."""

from __future__ import annotations

import gzip

import pytest

from data_lake_medallion_architecture_project_spark.sources.warc import (
    build_warc_blob,
    build_warc_record,
    parse_warc,
)


def test_roundtrip_compressed_and_plain():
    rows = [(1, "hello world"), (2, None), (3, "unicode ✓ text")]
    for compress in (True, False):
        recs = parse_warc(build_warc_blob(rows, compress=compress))
        assert [(r["uri"], r["content_length"]) for r in recs] == [
            ("http://example.org/doc/1", 11),
            ("http://example.org/doc/2", 0),
            ("http://example.org/doc/3", 16),  # UTF-8 bytes, not chars
        ]
        assert recs[2]["body"].decode("utf-8") == "unicode ✓ text"
        assert all(r["type"] == "conversion" for r in recs)
        assert all(r["record_id"].startswith("urn:uuid:") for r in recs)


def test_each_record_is_its_own_gzip_member():
    """The Common Crawl framing: each record independently gunzippable —
    decompressing ONLY the first member yields exactly the first record
    (per-record random access on petabyte archives)."""
    blob = build_warc_blob([(1, "first"), (2, "second")])
    first = gzip.decompress(blob)  # gzip module stops... (see assert)
    # gzip.decompress handles multi-member; split manually instead:
    import zlib

    d = zlib.decompressobj(wbits=31)
    member0 = d.decompress(blob)
    assert d.eof and d.unused_data  # more members follow
    recs = parse_warc(member0)
    assert len(recs) == 1 and recs[0]["body"] == b"first"
    assert len(parse_warc(blob)) == 2
    assert len(first) >= len(member0)  # full stream covers both members


def test_lf_only_headers_and_warcinfo_records():
    """Real crawls contain LF-only writers and warcinfo preambles — both
    must parse."""
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
    )
    rec = build_warc_record(7, "abc").replace(b"\r\n", b"\n")
    recs = parse_warc(info + rec)
    assert [r["type"] for r in recs] == ["warcinfo", "conversion"]
    assert recs[1]["body"] == b"abc"


def test_header_names_are_case_insensitive():
    rec = build_warc_record(9, "xy").replace(
        b"Content-Length", b"CONTENT-LENGTH"
    ).replace(b"WARC-Target-URI", b"warc-target-uri")
    out = parse_warc(rec)[0]
    assert out["content_length"] == 2
    assert out["uri"] == "http://example.org/doc/9"


def test_malformed_streams_fail_loudly():
    blob = build_warc_blob([(1, "hello")])
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(blob[:-4])
    bad = build_warc_record(1, "abc").replace(
        b"Content-Length: 3", b"Content-Length: 9999"
    )
    with pytest.raises(ValueError, match="Content-Length runs past"):
        parse_warc(bad)
    with pytest.raises(ValueError, match="expected WARC version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    nolen = build_warc_record(1, "abc").replace(
        b"Content-Length: 3\r\n", b""
    )
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(nolen)


def test_record_id_is_deterministic_and_distinct():
    a1 = parse_warc(build_warc_blob([(42, "x")]))[0]["record_id"]
    a2 = parse_warc(build_warc_blob([(42, "y")]))[0]["record_id"]
    b = parse_warc(build_warc_blob([(43, "x")]))[0]["record_id"]
    assert a1 == a2 and a1 != b  # id-keyed, content-independent


def test_spark_roundtrip_matches_source_table(spark):
    """The Spark write→parse pipeline reproduces every document exactly,
    whatever the partitioning (blobs are per-Arrow-batch, but the parsed
    row SET is partition-independent)."""
    from data_lake_medallion_architecture_project_spark.sources.warc import (
        build_warc_payloads,
        warc_records_from_payloads,
    )

    rows = [(i, f"doc body {i} ✓" * (1 + i % 3)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = warc_records_from_payloads(
        build_warc_payloads(docs.repartition(7))
    ).collect()
    assert len(out) == 50
    got = {r["uri"]: r["text"] for r in out}
    want = {f"http://example.org/doc/{i}": t for i, t in rows}
    assert got == want
    assert all(
        r["content_length"] == len(r["text"].encode("utf-8")) for r in out
    )


def test_spark_roundtrip_null_text_writes_empty_body(spark):
    """NULL text must land as a zero-length body (never crash on the
    pandas NaN rendering of SQL NULL, never drop the row)."""
    from data_lake_medallion_architecture_project_spark.sources.warc import (
        build_warc_payloads,
        warc_records_from_payloads,
    )

    docs = spark.createDataFrame(
        [(1, "present"), (2, None)], "doc_id long, text string"
    )
    out = {
        r["uri"]: (r["text"], r["content_length"])
        for r in warc_records_from_payloads(build_warc_payloads(docs)).collect()
    }
    assert out["http://example.org/doc/2"] == ("", 0)
    assert out["http://example.org/doc/1"] == ("present", 7)

def _raw_response_record(doc_id: int, body: bytes) -> bytes:
    """A hand-built 'response' record with an ARBITRARY bytes body — the
    shape real crawl WARCs carry (HTTP payloads, miscoded text) that the
    str-typed writer can't produce."""
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.org/doc/"
        + str(doc_id).encode()
        + b"\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n" + body + b"\r\n\r\n"
    )


def test_parse_keeps_arbitrary_binary_bodies_opaque():
    body = b"\xff\xfe\x00binary\x80payload\r\n\r\nWARC/1.0 fake"
    recs = parse_warc(_raw_response_record(5, body) + build_warc_record(6, "ok"))
    assert len(recs) == 2
    assert recs[0]["body"] == body  # byte-exact, no reparse of the fake
    assert recs[1]["body"] == b"ok"


def test_corrupt_gzip_member_raises_value_error():
    """zlib-level corruption surfaces as the parser's ValueError contract,
    not a bare zlib.error that per-blob error handling would miss."""
    blob = bytearray(build_warc_blob([(1, "hello"), (2, "world")]))
    blob[len(blob) // 2] ^= 0xFF  # flip a byte mid-stream
    with pytest.raises(ValueError, match="gzip member"):
        parse_warc(bytes(blob))


def test_lf_only_bulk_archive_parses_every_record():
    """A whole LF-only archive (the sloppy-writer case) must parse — and
    the CRLF terminator probe is bounded, so this is linear, not the
    per-record full-archive scan the unbounded find() would do."""
    raw = b"".join(
        build_warc_record(i, f"body {i}").replace(b"\r\n", b"\n")
        for i in range(500)
    )
    recs = parse_warc(raw)
    assert len(recs) == 500
    assert recs[499]["body"] == b"body 499"


def test_header_block_beyond_cap_fails_loudly():
    """Headers are capped at 64 KiB (documented); a block whose terminator
    lies past the cap raises rather than scanning unboundedly."""
    huge = (
        b"WARC/1.0\r\nX-Pad: " + b"a" * 70000
        + b"\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="never terminates"):
        parse_warc(huge)


def test_spark_tolerant_decode_survives_invalid_utf8(spark):
    """Production default (errors='replace'): a record with miscoded bytes
    parses — U+FFFD in the text, batch intact; errors='strict' raises."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from data_lake_medallion_architecture_project_spark.sources.warc import (
        warc_records_from_payloads,
    )

    blob = _raw_response_record(1, b"good ") + _raw_response_record(
        2, b"bad \xff\x80 bytes"
    )
    blobs = spark.createDataFrame(
        [(blob,)], StructType([StructField("blob", BinaryType())])
    )
    out = {r["uri"]: r["text"]
           for r in warc_records_from_payloads(blobs).collect()}
    assert out["http://example.org/doc/1"] == "good "
    assert out["http://example.org/doc/2"] == "bad �� bytes"
    with pytest.raises(Exception, match="UnicodeDecodeError|invalid start byte"):
        warc_records_from_payloads(blobs, errors="strict").collect()
