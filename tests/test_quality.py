"""Unit tests for the declarative data-quality suite (operators/quality.py)."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.operators.quality import (
    fk_report,
    in_range,
    in_set,
    matches,
    not_null,
    quality_report,
    unique,
)


def _report(df, checks):
    return {r["check_name"]: (r["violations"], r["passed"]) for r in quality_report(df, checks).collect()}


def test_each_check_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", "ok", 5.0),
            (1, None, "ok", 150.0),      # dup id, null email, out-of-range
            (2, "bad-email", "nope", 50.0),  # regex + enum violations
            (3, "c@x.com", "ok", None),   # null value is NOT a range violation
        ],
        "id long, email string, status string, v double",
    )
    got = _report(
        df,
        [
            unique("id"),
            not_null("email"),
            in_set("status", ("ok", "warn")),
            in_range("v", 0.0, 100.0),
            matches("email", r"^[^@]+@[^@]+$"),
        ],
    )
    assert got["unique(id)"] == (1, False)
    assert got["not_null(email)"] == (1, False)
    assert got["in_set(status)"] == (1, False)
    assert got["in_range(v)"] == (1, False)
    assert got["matches(email)"] == (1, False)


def test_clean_table_passes_and_empty_is_vacuous(spark):
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    got = _report(clean, [unique("id"), not_null("s")])
    assert all(v == (0, True) for v in got.values())
    empty = clean.filter("id < 0")
    got_empty = _report(empty, [unique("id"), not_null("s"), in_range("id", 0, 10)])
    assert all(v == (0, True) for v in got_empty.values())


def test_fk_report_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "ref long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    row = fk_report(child, "ref", parent, "id").first()
    assert row["check_name"] == "fk(ref)"
    assert row["violations"] == 1  # only 99; NULL FK is not an orphan
    assert row["passed"] is False


def test_repetition_signals_hand_computed(spark):
    from pyspark.sql import functions as F

    from data_lake_medallion_architecture_project_spark.functions.text import (
        dup_ngram_frac,
        top_ngram_mass,
        tokenize,
    )

    df = spark.createDataFrame(
        [
            (0, "a b a b a"),   # bigrams ab,ba,ab,ba → top 2/4; trigrams aba,bab,aba → dup 1/3
            (1, "x y z w"),     # all bigrams unique → top 1/3; trigrams unique → dup 0
            (2, "q q q q"),     # one bigram repeated → top 1.0; 2 identical trigrams → dup 1/2
            (3, "solo"),        # too short for any n-gram
        ],
        "doc_id long, text string",
    )
    toks = tokenize("text")
    got = {
        r["doc_id"]: (r["top2"], r["dup3"])
        for r in df.select(
            "doc_id",
            F.when(F.size(toks) >= 2, top_ngram_mass(toks, 2)).alias("top2"),
            F.when(F.size(toks) >= 3, dup_ngram_frac(toks, 3)).alias("dup3"),
        ).collect()
    }
    assert got[0] == (0.5, 1 - 2 / 3)
    assert got[1] == (1 / 3, 0.0)
    assert got[2] == (1.0, 0.5)
    assert got[3] == (None, None)
