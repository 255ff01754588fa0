"""Tests for operators/editdist.py — the FastSS recall lemma on adversarial
cases the supplier-name registry query can't produce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.editdist import edit_distance_pairs


def _pairs(spark, names):
    df = spark.createDataFrame(list(enumerate(names)), ["k", "s"])
    return {
        (r["a_key"], r["b_key"], r["dist"])
        for r in edit_distance_pairs(df, "k", "s").collect()
    }


def test_substitution_insertion_deletion_all_caught(spark):
    got = _pairs(spark, ["kitten", "mitten", "kitte", "kittten", "banana"])
    # kitten~mitten (sub), kitten~kitte (del), kitten~kittten (ins);
    # kitte~kittten is distance 2 → excluded; banana pairs with nothing.
    assert got == {(0, 1, 1), (0, 2, 1), (0, 3, 1)}


def test_identical_strings_are_distance_zero_pairs(spark):
    got = _pairs(spark, ["same", "same", "other"])
    assert got == {(0, 1, 0)}


def test_matches_naive_quadratic_on_random_corpus(spark):
    import itertools
    import random

    rng = random.Random(11)
    alphabet = "ab"
    names = ["".join(rng.choice(alphabet) for _ in range(5)) for _ in range(60)]
    got = _pairs(spark, names)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want
    assert want  # dense 2-letter corpus: the test is non-vacuous


def test_unsupported_distance_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["k", "s"])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "k", "s", max_dist=2)


def test_candidate_generation_is_jvm_side(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], ["k", "s"])
    plan = (
        edit_distance_pairs(df, "k", "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
