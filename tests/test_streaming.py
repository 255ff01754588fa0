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

# Silver keeps every distinct domain key (invalid rows are flagged, not
# dropped), so rows-written == distinct keys in the batch.
DOMAIN_KEYS = {"sales": "sale_id", "customer_events": "event_id", "inventory": "movement_id"}


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
    assert n1 == len({r[DOMAIN_KEYS[domain]] for r in b1})

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


def test_ingest_crash_replay_no_duplicates(spark, tmp_path):
    """Exactly-once under foreachBatch replay: simulate a crash between the
    Silver write and the checkpoint commit by deleting the commit marker of
    the completed batch, forcing Structured Streaming to re-run it on restart.
    The batchId-keyed overwrite (write_silver_batch) must converge instead of
    appending duplicates — a blind append would double the row count here."""
    domain = "sales"
    bronze, silver, ckpt = (str(tmp_path / p) for p in ("bronze", "silver", "ckpt"))
    b1 = GENERATORS[domain](seed=7, n=30)
    _write_bronze_csv(bronze, domain, b1, "batch1")
    n1 = run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)
    assert n1 > 0
    silver_path = os.path.join(silver, domain)
    count_before = spark.read.parquet(silver_path).count()

    # Crash window: the Silver write happened, the checkpoint commit did not.
    commits = os.path.join(ckpt, domain, "commits")
    batch_files = [f for f in os.listdir(commits) if f.isdigit()]
    latest = max(batch_files, key=int)
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    replayed = run_incremental_ingest(spark, bronze, silver, ckpt, domain, processed_at=RUN_TS)
    assert replayed == n1  # the batch genuinely re-ran ...
    assert spark.read.parquet(silver_path).count() == count_before  # ... idempotently


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
