"""Streaming substring-excision ingest (streaming/excise_ingest.py):
single-batch parity with the batch operator, cross-batch first-arrival-wins
span cuts, exactly-once replay, and idempotent re-runs."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.dedup import excise_shared_ngrams
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.excise_ingest import (
    excise_batch_against_table,
    run_excise_ingest,
)

BOILER = "all rights reserved by example corp"  # 6 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_batch_parity_with_batch_operator(spark, tmp_path):
    """Ingesting everything in ONE batch must reproduce the batch
    operator's rewritten texts byte-for-byte (empty state, identical
    canonical rule)."""
    docs = _docs(spark, [
        (1, f"{BOILER} alpha beta gamma delta"),
        (2, f"zeta eta theta iota kappa {BOILER}"),
        (3, "u v w x y u v w x y"),
    ])
    corpus = TxnTable(str(tmp_path / "corpus"))
    grams = TxnTable(str(tmp_path / "grams"))
    excise_batch_against_table(
        spark, corpus, grams, docs, "doc_id", "text", 5, "app", 0
    )
    streamed = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in corpus.read(spark).collect()
    }
    batch = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed"])
        for r in excise_shared_ngrams(docs, "doc_id", "text", n=5).collect()
    }
    assert streamed == batch


def test_cross_batch_first_arrival_wins_and_replay(spark, tmp_path):
    """Batch 2 re-sends batch 1's boilerplate inside new documents: the
    span is cut because its grams live in STATE, while batch 2's novel
    text lands intact; a replayed batch changes nothing."""
    corpus = TxnTable(str(tmp_path / "corpus"))
    grams = TxnTable(str(tmp_path / "grams"))
    b1 = _docs(spark, [(1, f"{BOILER} alpha beta gamma delta")])
    excise_batch_against_table(
        spark, corpus, grams, b1, "doc_id", "text", 5, "app", 0
    )
    b2 = _docs(spark, [
        (10, f"fresh novel opening words here {BOILER}"),
        (11, "entirely new content with plenty tokens"),
    ])
    for _ in range(2):  # second application replays the SAME batch id
        excise_batch_against_table(
            spark, corpus, grams, b2, "doc_id", "text", 5, "app", 1
        )
    rows = {r["doc_id"]: r for r in corpus.read(spark).collect()}
    assert set(rows) == {1, 10, 11}
    assert rows[1]["text"] == f"{BOILER} alpha beta gamma delta"  # canonical
    assert rows[10]["text"] == "fresh novel opening words here"  # span cut
    assert rows[10]["n_removed"] == 6
    assert rows[11]["text"] == "entirely new content with plenty tokens"
    assert rows[11]["n_removed"] == 0
    # State holds each gram hash exactly once despite the replay.
    gh = [r["gh"] for r in grams.read(spark).collect()]
    assert len(gh) == len(set(gh))


def test_run_excise_ingest_files_exactly_once(spark, tmp_path):
    """The file-source door: two files -> two batches in arrival order,
    re-run with nothing new is a no-op."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def _write(name, rows):
        stage = str(tmp_path / f"stage_{name}")
        _docs(spark, rows).coalesce(1).write.parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(stage, f), os.path.join(src, name))

    _write("b1.parquet", [(1, f"{BOILER} alpha beta gamma delta")])
    paths = {k: str(tmp_path / k) for k in ("corpus", "grams", "ckpt")}
    n1 = run_excise_ingest(
        spark, src, paths["corpus"], paths["grams"], paths["ckpt"]
    )
    assert n1 >= 1
    _write("b2.parquet", [(10, f"brand new words in front {BOILER}")])
    n2 = run_excise_ingest(
        spark, src, paths["corpus"], paths["grams"], paths["ckpt"]
    )
    assert n2 >= 1
    rows = {r["doc_id"]: r["text"] for r in TxnTable(paths["corpus"]).read(spark).collect()}
    assert rows[1] == f"{BOILER} alpha beta gamma delta"
    assert rows[10] == "brand new words in front"
    # Nothing new -> no batches applied.
    assert run_excise_ingest(
        spark, src, paths["corpus"], paths["grams"], paths["ckpt"]
    ) == 0


def test_ingest_preserves_non_text_columns(spark, tmp_path):
    """The intake door must not shed columns: source/stat columns ride
    through beside the rewritten text and the rewrite accounting."""
    docs = spark.createDataFrame(
        [(1, f"{BOILER} alpha beta gamma delta", "srcA", 7),
         (2, f"unrelated novel wording here {BOILER}", "srcB", 9)],
        "doc_id long, text string, source string, prio long",
    )
    corpus = TxnTable(str(tmp_path / "corpus"))
    grams = TxnTable(str(tmp_path / "grams"))
    excise_batch_against_table(
        spark, corpus, grams, docs, "doc_id", "text", 5, "app", 0
    )
    rows = {r["doc_id"]: r for r in corpus.read(spark).collect()}
    assert rows[1]["source"] == "srcA" and rows[1]["prio"] == 7
    assert rows[2]["source"] == "srcB" and rows[2]["prio"] == 9
    assert rows[2]["text"] == "unrelated novel wording here"
    assert rows[2]["n_removed"] == 6


def test_bloom_screened_path_matches_unscreened(spark, tmp_path):
    """Bloom screen consistency: with the gram-grain filter in front of the
    state semi-join, the rewritten corpus is IDENTICAL to the unscreened
    door's (zero false negatives by construction), across batches and under
    replay; the filter table stays bounded and idempotent."""
    batches = [
        [(1, f"{BOILER} alpha beta gamma delta")],
        [(10, f"fresh novel opening words here {BOILER}"),
         (11, "entirely new content with plenty tokens")],
        [(20, f"third wave reuses {BOILER} and fresh novel opening words here")],
    ]
    plain_c = TxnTable(str(tmp_path / "pc"))
    plain_g = TxnTable(str(tmp_path / "pg"))
    bloom_c = TxnTable(str(tmp_path / "bc"))
    bloom_g = TxnTable(str(tmp_path / "bg"))
    bloom_f = TxnTable(str(tmp_path / "bf"))
    for bid, rows in enumerate(batches):
        docs = _docs(spark, rows)
        excise_batch_against_table(
            spark, plain_c, plain_g, docs, "doc_id", "text", 5, "p", bid
        )
        for _ in range(2):  # replay every bloom batch
            excise_batch_against_table(
                spark, bloom_c, bloom_g, docs, "doc_id", "text", 5, "b", bid,
                bloom_table=bloom_f,
            )
    plain = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in plain_c.read(spark).collect()
    }
    screened = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in bloom_c.read(spark).collect()
    }
    assert plain == screened and len(plain) == 4
    # Filter rows are unique (j, pos) pairs despite the replays.
    f = [(r["j"], r["pos"]) for r in bloom_f.read(spark).collect()]
    assert len(f) == len(set(f)) > 0


def test_bloom_bootstrap_on_existing_gram_state(spark, tmp_path):
    """Enabling the bloom screen on a door that already has gram state must
    backfill the filter and still excise pre-filter spans correctly."""
    corpus = TxnTable(str(tmp_path / "c"))
    grams = TxnTable(str(tmp_path / "g"))
    bloom = TxnTable(str(tmp_path / "f"))
    # Batch 0: no bloom (pre-existing deployment).
    excise_batch_against_table(
        spark, corpus, grams,
        _docs(spark, [(1, f"{BOILER} alpha beta gamma delta")]),
        "doc_id", "text", 5, "a", 0,
    )
    # Batch 1: bloom enabled mid-life; the boilerplate predates the filter
    # and MUST still be cut (the backfill path).
    excise_batch_against_table(
        spark, corpus, grams,
        _docs(spark, [(10, f"late arrival repeating {BOILER}")]),
        "doc_id", "text", 5, "a", 1, bloom_table=bloom,
    )
    rows = {r["doc_id"]: r["text"] for r in corpus.read(spark).collect()}
    assert rows[10] == "late arrival repeating"


def test_colliding_accounting_and_stat_columns(spark, tmp_path):
    """ADVICE r11: a batch already carrying n_tokens/n_removed columns
    (document tables with stored stats) must not break the rejoin with
    duplicate column names — the door's rewrite accounting wins, because
    excision is precisely what invalidates a stored token stat — and a
    stored n_chars is refreshed from the REWRITTEN text (the trainprep
    post-excision rule) so it never disagrees with the stored text."""
    t1 = f"{BOILER} alpha beta gamma delta"
    t2 = f"unrelated novel wording here {BOILER}"
    docs = spark.createDataFrame(
        [(1, t1, -111, -1, 5), (2, t2, -222, -2, 6)],
        "doc_id long, text string, n_tokens long, n_removed long, n_chars long",
    )  # stored stats are deliberately garbage
    corpus = TxnTable(str(tmp_path / "corpus"))
    grams = TxnTable(str(tmp_path / "grams"))
    excise_batch_against_table(
        spark, corpus, grams, docs, "doc_id", "text", 5, "app", 0
    )
    rows = {r["doc_id"]: r for r in corpus.read(spark).collect()}
    # Door accounting, not the stale stored values.
    assert rows[1]["n_tokens"] == 10 and rows[1]["n_removed"] == 0
    assert rows[2]["n_tokens"] == 10 and rows[2]["n_removed"] == 6
    # Canonical doc keeps its text; the copy is excised.
    assert rows[1]["text"] == t1
    assert rows[2]["text"] == "unrelated novel wording here"
    # n_chars refreshed from the REWRITTEN text on both.
    assert rows[1]["n_chars"] == len(t1)
    assert rows[2]["n_chars"] == len("unrelated novel wording here")


def test_null_text_doc_stores_empty_string(spark, tmp_path):
    """ADVICE r12: a NULL-text document passing through the excision door
    must store '' in the corpus table (the batch operator's contract), not
    NULL — and its accounting columns stay NULL, never the legacy -1/-4 of
    size(NULL) under ansi.enabled=false."""
    docs = _docs(spark, [
        (1, f"{BOILER} alpha beta gamma delta"),
        (2, None),
        (3, f"{BOILER} zeta eta theta iota"),
    ])
    corpus = TxnTable(str(tmp_path / "corpus"))
    grams = TxnTable(str(tmp_path / "grams"))
    excise_batch_against_table(
        spark, corpus, grams, docs, "doc_id", "text", 5, "app", 0
    )
    rows = {r["doc_id"]: r for r in corpus.read(spark).collect()}
    assert rows[2]["text"] == ""
    assert rows[2]["n_tokens"] is None and rows[2]["n_removed"] is None
    # And byte parity with the batch operator holds corpus-wide.
    batch = {
        r["doc_id"]: r["cleaned_text"]
        for r in excise_shared_ngrams(docs, "doc_id", "text", n=5).collect()
    }
    assert {d: r["text"] for d, r in rows.items()} == batch
