"""Streaming PII-scrub ingest (streaming/scrub_ingest.py): batch parity
with the certified pii_scan_stats surface, case-preserving redaction,
the door-family column discipline, and exactly-once replay."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.plans import REGISTRY
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.scrub_ingest import (
    run_scrub_ingest,
    scrub_batch_against_table,
    scrubbed_batch,
)

SF = "/root/testdata/sf0.001"


def test_scrub_counts_match_certified_batch_query(spark):
    """On lowercase-only text (the certified query's domain) the door's
    per-class counts and redacted length equal pii_scan_stats exactly —
    same patterns, same rewrite order."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .withColumn("text", F.lower("text"))
    )
    got = {
        r["doc_id"]: r
        for r in scrubbed_batch(docs.drop("n_chars")).collect()
    }
    want = {
        r["doc_id"]: r
        for r in REGISTRY["pii_scan_stats"].build(spark, SF).collect()
        if r["doc_id"] < 200
    }
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["n_emails_redacted"] == w["n_emails"]
        assert g["n_ipv4_redacted"] == w["n_ipv4"]
        assert g["n_phones_redacted"] == w["n_phones"]
        assert len(g["text"]) == w["redacted_len"]


def test_scrub_is_case_preserving_and_case_blind(spark):
    """The door redacts MiXeD-case emails (case-blind match) while leaving
    the document's own casing untouched everywhere else."""
    docs = spark.createDataFrame(
        [(1, "Contact Bob.Smith@Example.COM about Order 7"),
         (2, "server at 10.0.0.1 called 555-123-4567 Twice")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrubbed_batch(docs).collect()}
    assert rows[1]["text"] == "Contact <EMAIL> about Order 7"
    assert rows[1]["n_emails_redacted"] == 1
    assert rows[2]["text"] == "server at <IP> called <PHONE> Twice"
    assert rows[2]["n_ipv4_redacted"] == 1
    assert rows[2]["n_phones_redacted"] == 1


def test_scrub_column_discipline(spark, tmp_path):
    """Door-family rules: non-text columns ride through, door-owned
    accounting names win over stale stored ones, stored n_chars is
    refreshed from the REDACTED text, and NULL text lands (not dropped)
    with zero counts."""
    docs = spark.createDataFrame(
        [(1, "mail me at a.b@example.com now", "srcA", 7, -5),
         (2, None, "srcB", 9, -6)],
        "doc_id long, text string, source string, n_chars long, "
        "n_emails_redacted long",
    )
    corpus = TxnTable(str(tmp_path / "corpus"))
    for _ in range(2):  # replayed batch id must be a no-op
        scrub_batch_against_table(
            spark, corpus, docs, "doc_id", "text", "app", 0
        )
    rows = {r["doc_id"]: r for r in corpus.read(spark).collect()}
    assert len(rows) == 2
    assert rows[1]["source"] == "srcA" and rows[2]["source"] == "srcB"
    assert rows[1]["text"] == "mail me at <EMAIL> now"
    assert rows[1]["n_emails_redacted"] == 1  # door value, not stored -5
    assert rows[1]["n_chars"] == len("mail me at <EMAIL> now")
    assert rows[2]["text"] is None
    assert rows[2]["n_emails_redacted"] == 0
    assert rows[2]["n_chars"] is None  # length(NULL) stays NULL, honestly


def test_run_scrub_ingest_files_exactly_once(spark, tmp_path):
    """File-level exactly-once: a second invocation with nothing new
    applies zero batches and the table is unchanged."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "stage"))
    for f in os.listdir(str(tmp_path / "stage")):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(str(tmp_path / "stage"), f),
                os.path.join(src, "batch1.parquet"),
            )
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    assert run_scrub_ingest(spark, src, corpus, ckpt) == 1
    n = TxnTable(corpus).read(spark).count()
    assert n == 100
    assert run_scrub_ingest(spark, src, corpus, ckpt) == 0
    assert TxnTable(corpus).read(spark).count() == 100


def test_scrub_counts_are_replacement_counts_on_overlap(spark):
    """ADVICE r12: a phone-shaped substring inside an email local part is
    swallowed by the email mask — it must be counted ONCE, as an email,
    never also as a phone. Counts are what the scrubber actually replaced."""
    docs = spark.createDataFrame(
        [
            # local part contains 555-123-4567 which the email regex's
            # [a-z0-9._%+-]+ swallows; no standalone phone remains.
            (1, "reach me at bob.555-123-4567@example.com today"),
            # a standalone phone AND an email: one of each.
            (2, "mail a@b.co or call 555-123-4567 now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrubbed_batch(docs).collect()}
    assert rows[1]["n_emails_redacted"] == 1
    assert rows[1]["n_phones_redacted"] == 0  # swallowed, not replaced
    assert "<PHONE>" not in rows[1]["text"] and "<EMAIL>" in rows[1]["text"]
    assert rows[2]["n_emails_redacted"] == 1
    assert rows[2]["n_phones_redacted"] == 1
    # Replacement-count invariant: per class, count == occurrences of the
    # mask token newly present in the redacted text.
    for r in rows.values():
        assert r["n_phones_redacted"] == r["text"].count("<PHONE>")
        assert r["n_emails_redacted"] == r["text"].count("<EMAIL>")
