"""Golden tests for the Silver→Gold builders (A1-A7) against a pandas oracle
mirroring /root/reference/pipeline/silver_to_gold.py semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from data_lake_medallion_architecture_project_spark.plans.gold import (
    GOLD_BUILDERS,
    build_all_gold,
    build_daily_sales_summary,
    build_inventory_net_position,
)
from data_lake_medallion_architecture_project_spark.plans.silver import clean_inventory, clean_sales
from data_lake_medallion_architecture_project_spark.schemas import BRONZE_SCHEMAS
from datetime import datetime, timezone

from data_lake_medallion_architecture_project_spark.sources.synthetic import gen_inventory_batch, gen_sales_batch

RUN_TS = "2026-08-13T00:00:00+00:00"


from tests.conftest import bronze_df as _spark_df

GEN_NOW = datetime(2026, 8, 1, 12, 0, 0, tzinfo=timezone.utc)


def _silver_sales(spark, seeds=(1, 2, 3), n=50):
    rows = [r for s in seeds for r in gen_sales_batch(s, n=n, now=GEN_NOW)]
    return clean_sales(_spark_df(spark, rows, "sales"), RUN_TS), rows


def test_daily_sales_summary_matches_pandas(spark):
    silver, rows = _silver_sales(spark)
    got = {r["date"].isoformat(): r for r in build_daily_sales_summary(silver).collect()}

    pdf = silver.toPandas()
    valid = pdf[pdf["is_valid"]].copy()
    valid["date"] = pd.to_datetime(valid["timestamp"], utc=True).dt.date
    exp = (
        valid.groupby("date")
        .agg(
            total_revenue=("total_amount", "sum"),
            order_count=("sale_id", "nunique"),
            avg_order_value=("total_amount", "mean"),
            unique_customers=("customer_id", "nunique"),
        )
        .round(2)
        .reset_index()
    )
    assert len(got) == len(exp)
    for _, e in exp.iterrows():
        g = got[e["date"].isoformat()]
        assert g["total_revenue"] == pytest.approx(e["total_revenue"], abs=0.011)
        assert g["order_count"] == e["order_count"]
        assert g["avg_order_value"] == pytest.approx(e["avg_order_value"], abs=0.011)
        assert g["unique_customers"] == e["unique_customers"]


def test_invalid_rows_never_reach_gold(spark):
    silver, _ = _silver_sales(spark)
    invalid_revenue = (
        silver.filter(~silver.is_valid).select("total_amount").toPandas()["total_amount"].sum()
    )
    # Force one invalid row to exist for the property to be meaningful.
    assert silver.filter(~silver.is_valid).count() > 0 or invalid_revenue == 0
    gold_sum = (
        build_daily_sales_summary(silver).toPandas()["total_revenue"].sum()
    )
    pdf = silver.toPandas()
    valid_sum = round(pdf[pdf["is_valid"]]["total_amount"].sum(), 1)
    assert round(gold_sum, 1) == pytest.approx(valid_sum, abs=0.5)


def test_net_position_identity_and_pivot_columns(spark):
    rows = [r for s in (5, 6, 7) for r in gen_inventory_batch(s, n=60, now=GEN_NOW)]
    silver = clean_inventory(_spark_df(spark, rows, "inventory"), RUN_TS)
    net = build_inventory_net_position(silver).toPandas()
    # All three pivot columns exist even if a movement type never appears.
    for c in ("inbound", "outbound", "adjustment", "net_position"):
        assert c in net.columns
    assert (net["net_position"] == net["inbound"] - net["outbound"]).all()
    assert net[["inbound", "outbound", "adjustment"]].notna().all().all()


def test_build_all_gold_skips_missing_domains(spark):
    silver, _ = _silver_sales(spark)
    out = build_all_gold({"sales": silver}, RUN_TS)
    assert set(out) == {
        "daily_sales_summary",
        "category_sales_summary",
        "payment_method_summary",
    }
    for df in out.values():
        assert df.filter(df.generated_at == RUN_TS).count() == df.count()


def test_gold_builder_registry_covers_all_seven():
    assert len(GOLD_BUILDERS) == 7
