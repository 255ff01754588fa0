"""Property-based tests (hypothesis) for the invariants SURVEY.md §5 promises.

Each property runs a bounded number of examples (a Spark job per example), so
example counts are kept small; the point is randomized structure, not volume:

* money: ``dec_sum`` equals the exact ``decimal.Decimal`` sum of 2-dp inputs
  and is invariant under repartitioning — the engine-determinism contract of
  ``functions/money.py``.
* silver: on arbitrarily dirty sales rows, ``is_valid ⇔ validation_errors
  empty``, auto-corrected totals satisfy the 0.01 epsilon, sale_ids are
  unique after dedup, and invalid rows never contribute to Gold revenue.
* vectors: the JVM-fold dot/norm agrees with numpy within float tolerance.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.functions.money import dec_sum
from data_lake_medallion_architecture_project_spark.functions.vectors import dot, l2_norm, to_double_array
from data_lake_medallion_architecture_project_spark.plans.gold import build_daily_sales_summary
from data_lake_medallion_architecture_project_spark.plans.silver import clean_sales

RUN_TS = "2026-08-13T00:00:00+00:00"

_spark = None


def _get_spark():
    # hypothesis @given can't take pytest fixtures alongside strategies
    # without extra plumbing; reuse the session-scoped session lazily.
    global _spark
    if _spark is None:
        from data_lake_medallion_architecture_project_spark.session import get_spark

        _spark = get_spark("tests", master="local[8]", shuffle_partitions=8)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


cents = st.integers(min_value=-10_000_00, max_value=10_000_00)


@settings(max_examples=12, deadline=None)
@given(st.lists(cents, min_size=1, max_size=60), st.integers(min_value=1, max_value=8))
def test_dec_sum_exact_and_partition_invariant(cent_vals, n_parts):
    spark = _get_spark()
    vals = [c / 100.0 for c in cent_vals]
    expect = float(sum(Decimal(c) for c in cent_vals) / 100)
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(n_parts)
    got = df.agg(dec_sum("x", "s")).first()["s"]
    assert got == expect, (got, expect)


sale_row = st.fixed_dictionaries(
    {
        "sale_id": st.one_of(st.none(), st.text("ab", min_size=1, max_size=4)),
        "timestamp": st.sampled_from(
            ["2024-01-01T00:00:00+00:00", "2024-02-03T04:05:06+00:00", "not-a-ts", None]
        ),
        "customer_id": st.one_of(st.none(), st.just("CUST-1")),
        "product_id": st.just("PROD-1"),
        "product_name": st.just("Widget"),
        "category": st.just("tools"),
        "quantity": st.one_of(st.none(), st.integers(min_value=-2, max_value=5)),
        "unit_price": st.one_of(st.none(), st.sampled_from([0.5, 10.0, 19.99])),
        "total_amount": st.one_of(st.none(), st.sampled_from([0.0, 5.0, 19.99, 100.0])),
        "payment_method": st.just("credit_card"),
        "status": st.just("completed"),
    }
)


@settings(max_examples=10, deadline=None)
@given(st.lists(sale_row, min_size=1, max_size=12))
def test_sales_cleaner_invariants(rows):
    spark = _get_spark()
    from tests.conftest import bronze_df

    cleaned = clean_sales(bronze_df(spark, rows, "sales"), RUN_TS).cache()
    try:
        got = cleaned.collect()
        # is_valid ⇔ empty error string, always.
        for r in got:
            assert r["is_valid"] == (r["validation_errors"] == ""), r
        # dedup: sale_ids unique among non-null keys.
        keys = [r["sale_id"] for r in got if r["sale_id"] is not None]
        assert len(keys) == len(set(keys))
        # auto-correction: wherever quantity and unit_price are present, the
        # surviving total_amount obeys the reference epsilon.
        for r in got:
            if r["quantity"] is not None and r["unit_price"] is not None and r["total_amount"] is not None:
                assert abs(r["total_amount"] - round(r["quantity"] * r["unit_price"], 2)) <= 0.011, r
        # Gold exclusion: revenue equals the sum over valid rows only.
        gold = build_daily_sales_summary(cleaned)
        total = gold.agg(F.sum("total_revenue")).first()[0] or 0.0
        valid_sum = sum(
            r["total_amount"]
            for r in got
            if r["is_valid"] and r["total_amount"] is not None
            and r["timestamp"] is not None
        )
        assert abs(total - valid_sum) < 0.05, (total, valid_sum)
    finally:
        cleaned.unpersist()


vec = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=2,
    max_size=16,
)


# derandomize: the tuple-length filter occasionally trips hypothesis's
# health/replay machinery when the suite runs under full JVM load (observed
# flaky in CI-style full runs, never in isolation); a fixed example set keeps
# the numpy-parity spot check deterministic.
@settings(max_examples=10, deadline=None, derandomize=True)
@given(st.tuples(vec, vec).filter(lambda t: len(t[0]) == len(t[1])))
def test_vector_fold_matches_numpy(pair):
    spark = _get_spark()
    a, b = pair
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    r = df.select(
        dot(to_double_array("a"), to_double_array("b")).alias("d"),
        l2_norm(to_double_array("a")).alias("na"),
    ).first()
    av = np.array(a, dtype=np.float32).astype(np.float64)
    bv = np.array(b, dtype=np.float32).astype(np.float64)
    assert abs(r["d"] - float(av @ bv)) < 1e-9 * max(1.0, abs(float(av @ bv)))
    assert abs(r["na"] - float(np.linalg.norm(av))) < 1e-9 * max(1.0, float(np.linalg.norm(av)))


asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # key
        st.integers(min_value=0, max_value=100),   # ts (seconds)
        st.booleans(),                             # is_left
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(asof_events)
def test_asof_join_matches_python_reference(rows):
    spark = _get_spark()
    from data_lake_medallion_architecture_project_spark.operators.asof import asof_join
    import datetime

    base = datetime.datetime(2024, 1, 1)
    lefts = [
        (i, k, base + datetime.timedelta(seconds=t))
        for i, (k, t, is_l) in enumerate(rows)
        if is_l
    ]
    rights = [
        (k, base + datetime.timedelta(seconds=t))
        for (k, t, is_l) in rows
        if not is_l
    ]
    if not lefts:
        return
    ldf = spark.createDataFrame(lefts, "row_id long, key long, ts timestamp")
    rdf = (
        spark.createDataFrame(rights, "key long, ts timestamp")
        if rights
        else spark.createDataFrame([], "key long, ts timestamp")
    )
    got = {
        r["row_id"]: r["asof_ts"]
        for r in asof_join(ldf, rdf, key="key", ts="ts").collect()
    }
    for row_id, k, lts in lefts:
        candidates = [rts for rk, rts in rights if rk == k and rts <= lts]
        expect = max(candidates) if candidates else None
        assert got[row_id] == expect, (row_id, got[row_id], expect)


# --------------------------- table diff (reconciliation) --------------------

_row = st.tuples(
    st.integers(min_value=0, max_value=15),        # key
    st.one_of(st.none(), st.integers(0, 3)),       # v (nullable)
    st.one_of(st.none(), st.sampled_from("ab")),   # s (nullable)
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_row, max_size=20), st.lists(_row, max_size=20))
def test_table_diff_matches_reference(left_rows, right_rows):
    """For arbitrary keyed tables (nullable values, absent keys on either
    side), table_diff's classification equals a dict-based reference."""
    from data_lake_medallion_architecture_project_spark.operators.tablediff import table_diff

    spark = _get_spark()

    def dedupe(rows):  # keys must be unique per side for a keyed diff
        return list({r[0]: r for r in rows}.values())

    left_rows, right_rows = dedupe(left_rows), dedupe(right_rows)
    schema = "k long, v long, s string"
    diff = table_diff(
        spark.createDataFrame(left_rows, schema),
        spark.createDataFrame(right_rows, schema),
        keys=["k"],
    )
    got = {r["k"]: r["status"] for r in diff.collect()}

    l = {r[0]: r[1:] for r in left_rows}
    r = {r[0]: r[1:] for r in right_rows}
    want = {}
    for k in set(l) | set(r):
        if k not in r:
            want[k] = "left_only"
        elif k not in l:
            want[k] = "right_only"
        elif l[k] != r[k]:  # tuple equality == null-safe column equality
            want[k] = "changed"
    assert got == want


# ------------------------------ SCD2 history --------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # key
            st.sampled_from(["A", "B", "C"]),        # attribute
            st.integers(min_value=1, max_value=9),   # business time
        ),
        min_size=1,
        max_size=8,
    )
)
def test_scd2_matches_reference_simulator(batches_flat):
    """Random change sequences, applied one change per batch, must produce
    exactly the history a dict-based SCD2 simulator produces — covering
    stale drops, no-op collapses, and interval chaining in combination."""
    import tempfile

    from data_lake_medallion_architecture_project_spark.storage import TxnTable
    from data_lake_medallion_architecture_project_spark.storage.scd2 import scd2_apply

    spark = _get_spark()
    # Reference: per key, current (attr, from); history rows as tuples.
    cur: dict = {}
    closed: list = []
    with tempfile.TemporaryDirectory() as tmp:
        t = TxnTable(tmp + "/dim")
        for key, attr, ts in batches_flat:
            tss = f"t{ts}"
            df = spark.createDataFrame(
                [(key, attr, tss, "p0")],
                "k long, attr string, ts string, part string",
            )
            scd2_apply(t, spark, df, keys=["k"], order_col="ts", partition_col="part")
            if key not in cur:
                cur[key] = (attr, tss)
            else:
                c_attr, c_from = cur[key]
                if tss > c_from and attr != c_attr:
                    closed.append((key, c_attr, c_from, tss))
                    cur[key] = (attr, tss)
        want = {
            (k, a, f, None, True) for k, (a, f) in cur.items()
        } | {(k, a, f, to, False) for (k, a, f, to) in closed}
        got = {
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in t.read(spark).collect()
        }
        assert got == want
