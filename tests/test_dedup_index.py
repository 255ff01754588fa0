"""Materialized MinHash index (operators/dedup_index) and streaming dedup
ingest (streaming/dedup_ingest): layout, plan shape, recall, exactly-once."""

from __future__ import annotations

import contextlib
import io


from data_lake_medallion_architecture_project_spark.operators.dedup_index import (
    banded_signatures,
    query_minhash_index,
    write_minhash_index,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen wild "
    "geese migrate south past the frozen river delta every autumn morning"
)


def _corpus(spark):
    rows = [
        (1, _BASE),
        (2, _BASE.replace("lazy", "sleepy")),  # near-dup of 1
        (3, "completely different text about spark adaptive query execution"),
        (4, "yet another unrelated document mentioning parquet footers only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_banded_signatures_shape(spark):
    b = banded_signatures(_corpus(spark), "doc_id", "text", num_perms=32, bands=8)
    rows = b.collect()
    assert len(rows) == 4 * 8  # one row per doc per band
    assert all(len(r["sig"]) == 32 for r in rows)
    # Band-qualified buckets: identical slices in different bands never collide.
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["id"], set()).add(r["bucket"])
    assert all(len(v) == 8 for v in per_doc.values())


def test_index_query_finds_near_dups_without_index_exchange(spark, tmp_path):
    corpus = _corpus(spark)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_minhash_index(
            corpus, "mh_idx", str(tmp_path / "idx"), "doc_id", "text"
        )
        batch = spark.createDataFrame(
            [
                (101, _BASE.replace("quick", "swift")),  # near-dup of 1 and 2
                (102, "entirely novel content with no corpus overlap at all"),
            ],
            "doc_id long, text string",
        )
        out = query_minhash_index(
            spark, "mh_idx", batch, "doc_id", "text", est_threshold=0.5
        )
        plan = _plan(out)
        assert "SortMergeJoin" in plan
        # Exactly one exchange subtree feeds the join: the probe side. The
        # bucketed index scan must consume its write-time layout directly.
        join_section = plan.split("SortMergeJoin")[0]
        assert join_section.count("Exchange hashpartitioning(bucket") <= 1, plan
        got = {(r["batch_id"], r["corpus_id"]) for r in out.collect()}
        assert (101, 1) in got
        assert all(b != 102 for b, _ in got)  # novel doc matches nothing
        ests = {r["corpus_id"]: r["est_jaccard"] for r in out.collect() if r["batch_id"] == 101}
        assert all(0.5 <= e <= 1.0 for e in ests.values())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS mh_idx")


def test_signature_agreement_estimates_jaccard(spark, tmp_path):
    """Identical docs must estimate 1.0; disjoint docs must never clear the
    0.5 gate (the estimator is unbiased, so extremes are deterministic)."""
    corpus = _corpus(spark)
    try:
        write_minhash_index(
            corpus, "mh_idx2", str(tmp_path / "idx2"), "doc_id", "text"
        )
        batch = spark.createDataFrame(
            [(201, _BASE)], "doc_id long, text string"  # verbatim copy of 1
        )
        out = query_minhash_index(
            spark, "mh_idx2", batch, "doc_id", "text", est_threshold=0.5
        ).collect()
        exact = [r for r in out if r["corpus_id"] == 1]
        assert len(exact) == 1 and exact[0]["est_jaccard"] == 1.0
        assert all(r["corpus_id"] in (1, 2) for r in out)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_idx2")


def test_streaming_dedup_ingest_exactly_once(spark, tmp_path):
    from data_lake_medallion_architecture_project_spark.storage import TxnTable
    from data_lake_medallion_architecture_project_spark.streaming.dedup_ingest import (
        dedup_batch_against_table,
        run_dedup_ingest,
    )

    src = tmp_path / "incoming"
    tbl = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # Batch 1: one internal dup pair (ids 10/11 share text).
    docs([(10, "alpha"), (11, "alpha"), (12, "beta")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    n = run_dedup_ingest(spark, str(src), tbl, ckpt)
    assert n == 1
    t = TxnTable(tbl)
    got = {
        (r["doc_id"], r["text"]) for r in t.read(spark).select("doc_id", "text").collect()
    }
    assert got == {(10, "alpha"), (12, "beta")}  # min id won the internal dup

    # Batch 2: cross-batch dup ("alpha") + one new doc.
    docs([(20, "alpha"), (21, "gamma")]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    n = run_dedup_ingest(spark, str(src), tbl, ckpt)
    assert n == 1
    got = {
        (r["doc_id"], r["text"]) for r in t.read(spark).select("doc_id", "text").collect()
    }
    assert got == {(10, "alpha"), (12, "beta"), (21, "gamma")}

    # Nothing new: the file-source checkpoint yields no batch.
    assert run_dedup_ingest(spark, str(src), tbl, ckpt) == 0

    # Crash-replay: re-applying an already-committed batch id is a no-op
    # (the txn marker), even with a duplicate-free source.
    version_before = t.snapshot().version
    dedup_batch_against_table(
        spark,
        t,
        docs([(99, "delta-new")]),
        "doc_id",
        "text",
        app_id="dedup_ingest/corpus",
        batch_id=1,  # already committed by the second run
    )
    assert t.snapshot().version == version_before
    assert len(t.read(spark).collect()) == 3


def test_near_dup_gate_chained_into_ingest(spark, tmp_path):
    """The composition the module docstrings promise: screen an incoming
    batch against the corpus MinHash index (near-dup gate), then push the
    survivors through the exactly-once exact-dedup ingest."""
    from data_lake_medallion_architecture_project_spark.storage import TxnTable
    from data_lake_medallion_architecture_project_spark.streaming.dedup_ingest import (
        dedup_batch_against_table,
    )

    corpus = _corpus(spark)
    try:
        write_minhash_index(
            corpus, "mh_gate", str(tmp_path / "gate_idx"), "doc_id", "text"
        )
        batch = spark.createDataFrame(
            [
                (301, _BASE.replace("fox", "wolf")),  # near-dup of corpus doc 1
                (302, "genuinely new content that survives the near-dup gate"),
            ],
            "doc_id long, text string",
        )
        flagged = query_minhash_index(
            spark, "mh_gate", batch, "doc_id", "text", est_threshold=0.5
        ).select("batch_id").distinct()
        survivors = batch.join(
            flagged, batch.doc_id == flagged.batch_id, "left_anti"
        )
        t = TxnTable(str(tmp_path / "gated_corpus"))
        dedup_batch_against_table(
            spark, t, survivors, "doc_id", "text", app_id="gate", batch_id=0
        )
        got = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
        assert got == {302}  # near-dup 301 gated out, novel 302 ingested
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_gate")


def test_bloom_screened_dedup_ingest(spark, tmp_path):
    """Bloom-state intake: the position-set table is maintained
    transactionally beside the corpus, screening preserves exact
    first-write-wins semantics, and a replayed batch no-ops BOTH tables."""
    from data_lake_medallion_architecture_project_spark.operators.bloom import BLOOM_K
    from data_lake_medallion_architecture_project_spark.storage import TxnTable
    from data_lake_medallion_architecture_project_spark.streaming.dedup_ingest import (
        dedup_batch_against_table,
        run_dedup_ingest,
    )

    src = tmp_path / "incoming"
    tbl = str(tmp_path / "corpus")
    blm = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    docs([(10, "alpha"), (11, "alpha"), (12, "beta")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    assert run_dedup_ingest(spark, str(src), tbl, ckpt, bloom_table_path=blm) == 1
    t, b = TxnTable(tbl), TxnTable(blm)
    got = {(r["doc_id"], r["text"]) for r in t.read(spark).collect()}
    assert got == {(10, "alpha"), (12, "beta")}
    # Filter state: exactly the 2 distinct hashes' position sets.
    pos1 = {(r["j"], r["pos"]) for r in b.read(spark).collect()}
    assert len(pos1) == BLOOM_K * 2
    assert {j for j, _ in pos1} == set(range(BLOOM_K))

    # Batch 2: cross-batch dup screened through the filter + one new doc.
    docs([(20, "alpha"), (21, "gamma")]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    assert run_dedup_ingest(spark, str(src), tbl, ckpt, bloom_table_path=blm) == 1
    got = {(r["doc_id"], r["text"]) for r in t.read(spark).collect()}
    assert got == {(10, "alpha"), (12, "beta"), (21, "gamma")}
    pos2 = {(r["j"], r["pos"]) for r in b.read(spark).collect()}
    assert pos1 < pos2 and len(pos2) <= BLOOM_K * 3  # gamma's positions added

    # Crash-replay: re-applying a committed batch id no-ops BOTH tables.
    tv, bv = t.snapshot().version, b.snapshot().version
    dedup_batch_against_table(
        spark, t, docs([(99, "delta-new")]), "doc_id", "text",
        app_id="dedup_ingest/corpus", batch_id=1, bloom_table=b,
    )
    assert t.snapshot().version == tv
    assert b.snapshot().version == bv
    assert {(r["j"], r["pos"]) for r in b.read(spark).collect()} == pos2


def test_bloom_enabled_on_existing_corpus_backfills(spark, tmp_path):
    """Enabling the Bloom filter on an already-populated corpus must
    backfill the position set from the corpus hash column — otherwise a
    dup of a pre-filter document would screen as 'guaranteed new' and the
    keyed merge would replace the first-written row."""
    from data_lake_medallion_architecture_project_spark.operators.bloom import BLOOM_K
    from data_lake_medallion_architecture_project_spark.storage import TxnTable
    from data_lake_medallion_architecture_project_spark.streaming.dedup_ingest import (
        dedup_batch_against_table,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    t = TxnTable(str(tmp_path / "corpus"))
    # Batch 0 ingested BEFORE any bloom table exists.
    dedup_batch_against_table(
        spark, t, docs([(10, "alpha"), (12, "beta")]), "doc_id", "text",
        app_id="boot", batch_id=0,
    )
    # Batch 1 is the first bloom-enabled batch; (20, "alpha") dups the
    # pre-filter corpus.
    b = TxnTable(str(tmp_path / "bloom"))
    dedup_batch_against_table(
        spark, t, docs([(20, "alpha"), (21, "gamma")]), "doc_id", "text",
        app_id="boot", batch_id=1, bloom_table=b,
    )
    got = {(r["doc_id"], r["text"]) for r in t.read(spark).collect()}
    assert got == {(10, "alpha"), (12, "beta"), (21, "gamma")}  # 10 survived
    # Filter state covers ALL three corpus hashes (backfill + batch).
    pos = {(r["j"], r["pos"]) for r in b.read(spark).collect()}
    assert len(pos) == BLOOM_K * 3
    # Batch 2 screens against the complete filter: a dup of the PRE-FILTER
    # corpus must still be rejected.
    dedup_batch_against_table(
        spark, t, docs([(30, "beta"), (31, "delta")]), "doc_id", "text",
        app_id="boot", batch_id=2, bloom_table=b,
    )
    got = {(r["doc_id"], r["text"]) for r in t.read(spark).collect()}
    assert got == {(10, "alpha"), (12, "beta"), (21, "gamma"), (31, "delta")}
