"""Streaming quality-gate ingest (streaming/quality_ingest.py): classifier-
routed exactly-once intake — pass/quarantine partition the input, the pass
set equals the batch gate query's predicate, re-runs are no-ops, and
replayed batches never double-append."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.plans import REGISTRY
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.quality_ingest import (
    quality_batch_against_tables,
    run_quality_ingest,
    scored_batch,
)

SF = "/root/testdata/sf0.001"


def _setup_source(spark, tmp_path, max_id):
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < max_id
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "stage1"))
    for f in os.listdir(str(tmp_path / "stage1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "stage1"), f),
                        os.path.join(src, "batch1.parquet"))
    return src, docs


def test_quality_ingest_routes_and_is_exactly_once(spark, tmp_path):
    src, docs = _setup_source(spark, tmp_path, 200)
    # Pick a threshold at the median logit so BOTH routes are non-empty.
    logits = sorted(
        r["logit"] for r in scored_batch(docs).select("logit").collect()
    )
    thr = logits[len(logits) // 2]
    paths = {
        k: str(tmp_path / k) for k in ("pass_tbl", "quar_tbl", "ckpt")
    }
    n = run_quality_ingest(
        spark, src, paths["pass_tbl"], paths["quar_tbl"], paths["ckpt"],
        threshold=thr,
    )
    assert n == 1
    passed = TxnTable(paths["pass_tbl"]).read(spark)
    quarantined = TxnTable(paths["quar_tbl"]).read(spark)
    pass_ids = {r["doc_id"] for r in passed.select("doc_id").collect()}
    quar_ids = {r["doc_id"] for r in quarantined.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # Routed, never dropped: the two tables PARTITION the input.
    assert pass_ids and quar_ids
    assert pass_ids | quar_ids == all_ids
    assert not (pass_ids & quar_ids)

    # Pass set == the batch gate query's logit filtered at the same
    # threshold (logit_expr is shared, so this must be exact equality).
    gate = REGISTRY["doc_source_logreg_scores"].build(spark, SF).filter(
        (F.col("logit") > F.lit(thr)) & (F.col("doc_id") < 200)
    )
    assert {r["doc_id"] for r in gate.select("doc_id").collect()} == pass_ids

    # Quarantine rows carry the audit logit, matching the gate query's.
    gate_logits = {
        r["doc_id"]: r["logit"]
        for r in REGISTRY["doc_source_logreg_scores"].build(spark, SF).collect()
    }
    for r in quarantined.select("doc_id", "logit").collect():
        assert r["logit"] == gate_logits[r["doc_id"]]

    # Idempotence: nothing new -> no batches, tables unchanged.
    assert run_quality_ingest(
        spark, src, paths["pass_tbl"], paths["quar_tbl"], paths["ckpt"],
        threshold=thr,
    ) == 0
    assert passed.count() == len(pass_ids)
    assert quarantined.count() == len(quar_ids)


def test_quality_batch_replay_is_noop(spark, tmp_path):
    """A replayed (app_id, batch_id) — the crash-between-commit-and-
    checkpoint window — must not double-append to either table."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    pass_t = TxnTable(str(tmp_path / "p"))
    quar_t = TxnTable(str(tmp_path / "q"))
    thr = sorted(
        r["logit"] for r in scored_batch(docs).select("logit").collect()
    )[50]
    for _ in range(2):  # second application replays the SAME batch id
        quality_batch_against_tables(
            spark, pass_t, quar_t, docs, "doc_id", "text", thr, "app", 0
        )
    n_pass = pass_t.read(spark).count()
    n_quar = quar_t.read(spark).count()
    assert n_pass + n_quar == 100
    ids = [
        r["doc_id"] for r in pass_t.read(spark).select("doc_id").collect()
    ] + [r["doc_id"] for r in quar_t.read(spark).select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == 100


def test_null_text_routes_to_quarantine_not_dropped(spark, tmp_path):
    """A NULL-text document has a NULL logit; it must land in quarantine
    (no evidence it passes), never vanish — the routed-never-dropped
    contract under the SQL three-valued-logic trap."""
    docs = spark.createDataFrame(
        [(1, "perfectly ordinary words right here"), (2, None)],
        "doc_id long, text string",
    )
    pass_t = TxnTable(str(tmp_path / "p"))
    quar_t = TxnTable(str(tmp_path / "q"))
    quality_batch_against_tables(
        spark, pass_t, quar_t, docs, "doc_id", "text", -1e9, "app", 0
    )
    pass_ids = {r["doc_id"] for r in pass_t.read(spark).select("doc_id").collect()}
    quar_rows = {r["doc_id"]: r["logit"] for r in quar_t.read(spark).collect()}
    assert pass_ids == {1}          # threshold -1e9: every scored doc passes
    assert set(quar_rows) == {2}    # the null-text doc is quarantined
    assert quar_rows[2] is None     # with its (null) logit as the audit value


def test_stored_stat_column_preserved_and_feature_sourced_from_it(
    spark, tmp_path
):
    """ADVICE r11, both halves. (1) A stored n_chars stat column rides
    through BOTH routed tables untouched — the door must neither recompute
    it nor shed it. (2) The logit's n_chars feature is the STORED column
    (exactly how the certified gate query sources it), with length(text)
    only as the no-column fallback — so door/gate pass-set parity is
    structural, proven here on data where stored n_chars deliberately
    disagrees with length(text)."""
    from data_lake_medallion_architecture_project_spark.functions.text import (
        distinct_token_count,
        token_count,
        tokenize,
        total_token_chars,
    )
    from data_lake_medallion_architecture_project_spark.operators.logreg import (
        logit_expr,
    )
    from data_lake_medallion_architecture_project_spark.plans._pinned_logreg import (
        _LOGREG_BIAS,
        _LOGREG_MEAN,
        _LOGREG_STD,
        _LOGREG_WEIGHTS,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", 999), (2, "epsilon zeta", 3)],
        "doc_id long, text string, n_chars long",
    )  # stored n_chars != length(text) on purpose
    scored = {r["doc_id"]: r for r in scored_batch(docs).collect()}
    # (1) stored values intact on the scored rows
    assert scored[1]["n_chars"] == 999 and scored[2]["n_chars"] == 3

    # (2) logit == the gate-style expression over the STORED n_chars ...
    toks = tokenize("text")
    stored_ref = {
        r["doc_id"]: r["z"]
        for r in docs.select(
            "doc_id",
            logit_expr(
                (
                    token_count(toks),
                    distinct_token_count(toks),
                    total_token_chars(toks),
                    F.col("n_chars").cast("long"),
                ),
                _LOGREG_MEAN,
                _LOGREG_STD,
                _LOGREG_WEIGHTS,
                _LOGREG_BIAS,
            ).alias("z"),
        ).collect()
    }
    assert scored[1]["logit"] == stored_ref[1]
    assert scored[2]["logit"] == stored_ref[2]
    # ... and NOT the length(text) recomputation (999 != 22 makes them
    # genuinely different, so this assertion has teeth).
    length_ref = {
        r["doc_id"]: r["z"]
        for r in docs.drop("n_chars").select(
            "doc_id",
            logit_expr(
                (
                    token_count(toks),
                    distinct_token_count(toks),
                    total_token_chars(toks),
                    F.length(F.col("text")).cast("long"),
                ),
                _LOGREG_MEAN,
                _LOGREG_STD,
                _LOGREG_WEIGHTS,
                _LOGREG_BIAS,
            ).alias("z"),
        ).collect()
    }
    assert scored[1]["logit"] != length_ref[1]

    # Route through the tables: the stored stat survives on both sides.
    pass_t = TxnTable(str(tmp_path / "p"))
    quar_t = TxnTable(str(tmp_path / "q"))
    thr = (stored_ref[1] + stored_ref[2]) / 2  # splits the two docs
    quality_batch_against_tables(
        spark, pass_t, quar_t, docs, "doc_id", "text", thr, "app", 0
    )
    landed = {
        r["doc_id"]: r["n_chars"]
        for r in pass_t.read(spark).collect() + quar_t.read(spark).collect()
    }
    assert landed == {1: 999, 2: 3}


def test_no_stored_stat_falls_back_to_text_length(spark):
    """Without an n_chars column the feature falls back to length(text) —
    the schema the earlier door tests exercise stays supported, and the
    door still adds only (logit, shard) to the row."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    out = scored_batch(docs)
    assert set(out.columns) == {"doc_id", "text", "logit", "id_shard"}
