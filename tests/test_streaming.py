"""End-to-end medallion flow: generators → Bronze CSV → incremental Silver
ingest (Structured Streaming, AvailableNow) → Gold snapshot.

Covers the reference's idempotence contract (re-run with no new files is a
no-op — bronze_to_silver.py:198-200) without its ledger crash window."""

from __future__ import annotations

import csv
import os

import pytest

from data_lake_medallion_architecture_project_spark.plans.gold import build_all_gold
from data_lake_medallion_architecture_project_spark.schemas import BRONZE_SCHEMAS
from data_lake_medallion_architecture_project_spark.sources.synthetic import GENERATORS
from data_lake_medallion_architecture_project_spark.sources.writers import read_latest_gold, write_gold_snapshot
from data_lake_medallion_architecture_project_spark.streaming.ingest import run_incremental_ingest

RUN_TS = "2026-08-13T00:00:00+00:00"


def _write_bronze_csv(root: str, domain: str, batch: list[dict], name: str) -> str:
    d = os.path.join(root, domain)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{name}.csv")
    cols = [f.name for f in BRONZE_SCHEMAS[domain].fields]
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=cols)
        w.writeheader()
        w.writerows(batch)
    return path


@pytest.mark.parametrize("domain", ["sales", "customer_events", "inventory"])
def test_incremental_ingest_exactly_once(spark, tmp_path, domain):
    bronze, silver, ckpt = (str(tmp_path / p) for p in ("bronze", "silver", "ckpt"))
    gen = GENERATORS[domain]

    b1 = gen(seed=1)
    _write_bronze_csv(bronze, domain, b1, "batch1")
    n1 = run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)
    assert n1 == len({tuple(sorted(r.items(), key=lambda kv: kv[0])) for r in map(dict, b1)}) or n1 <= len(b1)

    silver_df = spark.read.parquet(os.path.join(silver, domain))
    first_count = silver_df.count()
    assert first_count > 0
    assert {"is_valid", "validation_errors", "processed_at"} <= set(silver_df.columns)
    assert {"year", "month", "day"} <= set(silver_df.columns)  # Hive partitions

    # Idempotence: nothing new → no rows written.
    n_again = run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)
    assert n_again == 0
    assert spark.read.parquet(os.path.join(silver, domain)).count() == first_count

    # New file → only its rows are added.
    b2 = gen(seed=2)
    _write_bronze_csv(bronze, domain, b2, "batch2")
    n2 = run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)
    assert 0 < n2 <= len(b2)
    assert spark.read.parquet(os.path.join(silver, domain)).count() == first_count + n2


def test_full_medallion_flow_to_gold(spark, tmp_path):
    bronze, silver, ckpt, gold = (
        str(tmp_path / p) for p in ("bronze", "silver", "ckpt", "gold")
    )
    for domain, gen in GENERATORS.items():
        for seed in (10, 11):
            _write_bronze_csv(bronze, domain, gen(seed=seed, n=40), f"b{seed}")
        run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)

    silver_frames = {
        d: spark.read.parquet(os.path.join(silver, d)) for d in GENERATORS
    }
    gold_frames = build_all_gold(silver_frames, RUN_TS)
    assert len(gold_frames) == 7
    for table, df in gold_frames.items():
        write_gold_snapshot(df, gold, table)
        back = read_latest_gold(spark, gold, table)
        assert back.count() == df.count(), table

    # Spot-check: Gold revenue equals the valid-row revenue in Silver.
    import pyspark.sql.functions as F

    sales = silver_frames["sales"].filter(F.col("is_valid"))
    expected = sales.agg(F.bround(F.sum("total_amount"), 0)).first()[0]
    got = (
        gold_frames["daily_sales_summary"]
        .agg(F.bround(F.sum("total_revenue"), 0))
        .first()[0]
    )
    assert abs(got - expected) <= 1.0
