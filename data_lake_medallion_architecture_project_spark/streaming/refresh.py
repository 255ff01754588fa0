"""Incremental Silver→Gold maintenance — bounded-work refresh of the Gold
aggregates.

The reference rebuilds every Gold table from ALL Silver history every 30
minutes (``/root/reference/pipeline/silver_to_gold.py:219-235`` reading the
whole tree via ``storage/local_storage.py:129-137``) — O(history) per run,
its biggest scalability cliff (SURVEY.md §4.1). This module replaces that
with partition-grain incremental view maintenance:

1. Stream the Silver parquet tree (file-source checkpoint = exactly-once
   accounting of which Silver files have been folded in).
2. Per micro-batch, derive the set of **affected day partitions** from the
   new rows' event dates.
3. Re-aggregate ONLY those days from Silver and dynamically overwrite just
   those ``date=`` partitions of each Gold table.

Work per refresh is O(new data + affected partitions), independent of total
history, while the on-disk Gold stays bit-identical to a full recompute (the
invariant the tests assert). All Gold aggregates are day-grain, so a day is
recomputable in isolation; overwriting whole day partitions makes the fold
idempotent under micro-batch replay (no read-modify-write of aggregate rows).

At 100 TB the same code holds: affected-day re-aggregation scans only those
days' Silver files (partition pruning needs Silver laid out by *event* date —
``write_silver`` partitions by processing date for Bronze fidelity, so the
batch filter here is a scan-filter, not a partition prune; an event-date
layout or a Delta/ZORDER index is the upgrade), and dynamic partition
overwrite touches only the changed Gold directories.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.gold import GOLD_BUILDERS


def _domain_tables(domain: str):
    return {t: b for t, (d, b) in GOLD_BUILDERS.items() if d == domain}


def refresh_affected_dates(
    spark: SparkSession,
    silver_domain_dir: str,
    gold_root: str,
    domain: str,
    affected_dates: list,
    generated_at: str,
) -> list[str]:
    """Recompute the given day partitions of every Gold table of a domain.

    Reads Silver once (filtered to the affected days), runs the normal Gold
    builders — identical aggregation code to the full batch path — and
    dynamic-partition-overwrites only those ``date=`` partitions.
    """
    if not affected_dates:
        return []
    silver = spark.read.parquet(silver_domain_dir)
    day = F.to_date("timestamp")
    scoped = silver.filter(day.isin(affected_dates))
    written = []
    for table, builder in _domain_tables(domain).items():
        out = builder(scoped).withColumn("generated_at", F.lit(generated_at))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date")
            .parquet(os.path.join(gold_root, table))
        )
        written.append(table)
    return written


def run_incremental_gold_refresh(
    spark: SparkSession,
    silver_root: str,
    gold_root: str,
    checkpoint_root: str,
    domain: str,
    generated_at: str | None = None,
) -> list:
    """Fold all not-yet-seen Silver files of a domain into the Gold tables.

    Returns the sorted list of day partitions refreshed this invocation.
    Re-running with the same checkpoint and no new Silver files refreshes
    nothing (idempotence). Crash-safe: a batch that dies mid-write re-runs
    whole-partition overwrites, which converge to the same bytes.
    """
    generated_at = generated_at or datetime.now(timezone.utc).isoformat()
    silver_dir = os.path.join(silver_root, domain)
    checkpoint = os.path.join(checkpoint_root, f"gold_{domain}")
    schema = spark.read.parquet(silver_dir).schema

    refreshed: set = set()

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        days = [
            r["d"]
            for r in batch_df.filter(F.col("is_valid"))
            .select(F.to_date("timestamp").alias("d"))
            .filter(F.col("d").isNotNull())
            .distinct()
            .collect()
        ]
        refresh_affected_dates(
            spark, silver_dir, gold_root, domain, days, generated_at
        )
        refreshed.update(days)

    query = (
        spark.readStream.schema(schema)
        .parquet(silver_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sorted(refreshed)
