"""Smoke test for the one-command pipeline runner (the reference's DAG
front door, ``/root/reference/dags/data_lake_pipeline.py:46-149``)."""

from __future__ import annotations

from data_lake_medallion_architecture_project_spark.pipeline import (
    gold_row_counts,
    run_pipeline,
)
from data_lake_medallion_architecture_project_spark.plans.gold import GOLD_BUILDERS

RUN_TS = "2026-08-13T00:00:00+00:00"


def test_pipeline_end_to_end_populates_all_gold_tables(spark, tmp_path):
    work = str(tmp_path / "lake")
    stats = run_pipeline(spark, work, gen_ticks=2, seed=100, processed_at=RUN_TS)
    assert set(stats["silver_rows"]) == {"sales", "customer_events", "inventory"}
    assert all(n > 0 for n in stats["silver_rows"].values())

    counts = gold_row_counts(spark, work)
    assert set(counts) == set(GOLD_BUILDERS)  # all 7 Gold tables exist
    assert all(n > 0 for n in counts.values())

    # Second cycle is incremental: new ticks add rows; re-processing is scoped
    # to the new files only (checkpoint), and Gold tables stay populated.
    stats2 = run_pipeline(spark, work, gen_ticks=4, seed=100, processed_at=RUN_TS)
    # ticks 0-1 already staged and ingested; only ticks 2-3 are new rows.
    assert all(n > 0 for n in stats2["silver_rows"].values())
    counts2 = gold_row_counts(spark, work)
    assert all(counts2[t] >= counts[t] for t in counts)
