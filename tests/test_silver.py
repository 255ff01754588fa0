"""Golden tests for the Bronze→Silver cleaners.

The reference's semantics ARE pandas semantics, so the oracle here is a small
independent pandas implementation of each rule set (mirroring
/root/reference/pipeline/bronze_to_silver.py behavior, not its code). Spark
cleaner output must match row-for-row on is_valid / validation_errors /
corrected values.
"""

from __future__ import annotations

import pandas as pd
import pytest

from datetime import datetime, timezone

from data_lake_medallion_architecture_project_spark.plans.silver import (
    clean_customer_events,
    clean_inventory,
    clean_sales,
)
from data_lake_medallion_architecture_project_spark.schemas import (
    BRONZE_SCHEMAS,
    EVENTS_REQUIRED,
    INVENTORY_REQUIRED,
    SALES_REQUIRED,
    VALID_EVENT_TYPES,
    VALID_MOVEMENT_TYPES,
)
from data_lake_medallion_architecture_project_spark.sources.synthetic import (
    gen_customer_events_batch,
    gen_inventory_batch,
    gen_sales_batch,
)

RUN_TS = "2026-08-13T00:00:00+00:00"
# Pinned generation clock: wall-clock timestamps made one-in-a-million parse
# divergences unreproducible; a fixed now makes every run byte-identical.
GEN_NOW = datetime(2026, 8, 1, 12, 0, 0, tzinfo=timezone.utc)


from tests.conftest import bronze_df as _spark_df


def _pandas_errors(pdf: pd.DataFrame, required, extra_rules=()) -> pd.Series:
    errors = pd.Series([""] * len(pdf), index=pdf.index)
    for col in required:
        errors[pdf[col].isnull()] += f"NULL:{col}; "
    for mask, msg in extra_rules:
        errors[mask] += f"{msg}; "
    return errors.str.strip()


def _collect(df):
    return {
        r["__key"]: r
        for r in (
            df.withColumnRenamed(df.columns[0], "__key") if False else df
        ).collect()
    }


@pytest.mark.parametrize("seed", [42, 7, 99])
def test_sales_cleaner_matches_pandas_oracle(spark, seed):
    rows = gen_sales_batch(seed, n=60, now=GEN_NOW)
    # hand-crafted edge rows
    rows += [
        {**rows[0], "sale_id": "edge-null-ts", "timestamp": "not-a-timestamp"},
        {**rows[1], "sale_id": "edge-null-qty", "quantity": None},
        {**rows[2], "sale_id": "edge-bad-total", "quantity": 2.0, "unit_price": 10.0,
         "total_amount": 25.0},
        {**rows[3], "sale_id": "edge-eps", "quantity": 3.0, "unit_price": 1.0,
         "total_amount": 3.01},  # |diff| == 0.01 → NOT corrected (> 0.01 strictly)
        {**rows[4], "sale_id": None},
    ]
    out = {r["sale_id"]: r for r in clean_sales(_spark_df(spark, rows, "sales"), RUN_TS).collect()}

    pdf = pd.DataFrame(rows)
    pdf["timestamp"] = pd.to_datetime(pdf["timestamp"], utc=True, errors="coerce")
    pdf = pdf.drop_duplicates(subset=["sale_id"])
    computable = pdf["quantity"].notna() & pdf["unit_price"].notna()
    expected = (pdf.loc[computable, "quantity"] * pdf.loc[computable, "unit_price"]).round(2)
    mismatch = (pdf.loc[computable, "total_amount"] - expected).abs() > 0.01
    pdf.loc[computable & mismatch, "total_amount"] = expected[mismatch]
    pdf["validation_errors"] = _pandas_errors(pdf, SALES_REQUIRED)
    pdf["is_valid"] = pdf["validation_errors"] == ""

    assert len(out) == len(pdf)
    for _, exp in pdf.iterrows():
        got = out[exp["sale_id"]]
        assert got["validation_errors"] == exp["validation_errors"], exp["sale_id"]
        assert got["is_valid"] == exp["is_valid"]
        if pd.isna(exp["total_amount"]):
            assert got["total_amount"] is None
        else:
            assert got["total_amount"] == pytest.approx(exp["total_amount"], abs=1e-9)
        assert got["processed_at"] == RUN_TS


@pytest.mark.parametrize("seed", [42, 7])
def test_events_cleaner_matches_pandas_oracle(spark, seed):
    rows = gen_customer_events_batch(seed, n=80, now=GEN_NOW)
    rows += [
        {**rows[0], "event_id": "edge-unknown", "event_type": "UNKNOWN"},
        {**rows[1], "event_id": "edge-null-cust", "customer_id": None},
        {**rows[2], "event_id": "edge-null-type", "event_type": None},
    ]
    out = {
        r["event_id"]: r
        for r in clean_customer_events(_spark_df(spark, rows, "customer_events"), RUN_TS).collect()
    }
    pdf = pd.DataFrame(rows).drop_duplicates(subset=["event_id"])
    pdf["timestamp"] = pd.to_datetime(pdf["timestamp"], utc=True, errors="coerce")
    enum_bad = ~pdf["event_type"].isin(VALID_EVENT_TYPES) & pdf["event_type"].notna()
    pdf["validation_errors"] = _pandas_errors(
        pdf, EVENTS_REQUIRED, [(enum_bad, "INVALID_EVENT_TYPE")]
    )
    pdf["is_valid"] = pdf["validation_errors"] == ""
    assert len(out) == len(pdf)
    for _, exp in pdf.iterrows():
        got = out[exp["event_id"]]
        assert got["validation_errors"] == exp["validation_errors"], exp["event_id"]
        assert got["is_valid"] == exp["is_valid"]


@pytest.mark.parametrize("seed", [42, 7])
def test_inventory_cleaner_matches_pandas_oracle(spark, seed):
    rows = gen_inventory_batch(seed, n=80, now=GEN_NOW)
    rows += [
        {**rows[0], "movement_id": "edge-transfer", "movement_type": "TRANSFER"},
        {**rows[1], "movement_id": "edge-zero-qty", "quantity": 0.0},
        {**rows[2], "movement_id": "edge-null-qty", "quantity": None},
        {**rows[3], "movement_id": "edge-neg-qty", "quantity": -5.0},
    ]
    out = {
        r["movement_id"]: r
        for r in clean_inventory(_spark_df(spark, rows, "inventory"), RUN_TS).collect()
    }
    pdf = pd.DataFrame(rows).drop_duplicates(subset=["movement_id"])
    pdf["timestamp"] = pd.to_datetime(pdf["timestamp"], utc=True, errors="coerce")
    enum_bad = ~pdf["movement_type"].isin(VALID_MOVEMENT_TYPES) & pdf["movement_type"].notna()
    qty_bad = pdf["quantity"].notna() & (pd.to_numeric(pdf["quantity"], errors="coerce") <= 0)
    pdf["validation_errors"] = _pandas_errors(
        pdf,
        INVENTORY_REQUIRED,
        [(enum_bad, "INVALID_MOVEMENT_TYPE"), (qty_bad, "NON_POSITIVE_QUANTITY")],
    )
    pdf["is_valid"] = pdf["validation_errors"] == ""
    assert len(out) == len(pdf)
    for _, exp in pdf.iterrows():
        got = out[exp["movement_id"]]
        assert got["validation_errors"] == exp["validation_errors"], exp["movement_id"]
        assert got["is_valid"] == exp["is_valid"]


def test_dedup_removes_exact_duplicates(spark):
    rows = gen_sales_batch(1, n=5, now=GEN_NOW)
    rows.append(dict(rows[0]))  # force a duplicate
    cleaned = clean_sales(_spark_df(spark, rows, "sales"), RUN_TS)
    ids = [r["sale_id"] for r in cleaned.select("sale_id").collect()]
    assert len(ids) == len(set(ids))


@pytest.mark.parametrize("seed", [42, 7])
def test_sales_cleaner_decimal_mode_agrees_with_double(spark, seed):
    """SURVEY §1.4's DecimalType(12,2) upgrade path: same rows corrected, same
    2-dp money values, same validity verdicts as the default double path —
    the epsilon contract survives the type change."""
    from decimal import Decimal

    rows = gen_sales_batch(seed, n=60, now=GEN_NOW)
    rows += [
        {**rows[0], "sale_id": "edge-bad-total", "quantity": 2.0,
         "unit_price": 10.0, "total_amount": 25.0},     # corrected to 20.00
        {**rows[1], "sale_id": "edge-eps", "quantity": 3.0, "unit_price": 1.0,
         "total_amount": 3.01},                          # ==0.01 → untouched
        {**rows[2], "sale_id": "edge-null-qty", "quantity": None},
    ]
    src = _spark_df(spark, rows, "sales")
    dbl = {r["sale_id"]: r for r in clean_sales(src, RUN_TS).collect()}
    dec = {
        r["sale_id"]: r
        for r in clean_sales(src, RUN_TS, money_type="decimal").collect()
    }
    assert set(dbl) == set(dec)
    # The decimal path really is decimal.
    dec_schema = dict(
        clean_sales(src, RUN_TS, money_type="decimal").dtypes
    )
    assert dec_schema["total_amount"] == "decimal(12,2)"
    assert dec_schema["unit_price"] == "decimal(12,2)"
    for k, d in dbl.items():
        g = dec[k]
        assert g["is_valid"] == d["is_valid"], k
        assert g["validation_errors"] == d["validation_errors"], k
        if d["total_amount"] is None:
            assert g["total_amount"] is None, k
        else:
            # Same money value to the cent, exactly.
            assert g["total_amount"] == Decimal(
                f"{d['total_amount']:.2f}"
            ), k
    # The hand-crafted corrections happened identically in both modes.
    assert dec["edge-bad-total"]["total_amount"] == Decimal("20.00")
    assert dec["edge-eps"]["total_amount"] == Decimal("3.01")
