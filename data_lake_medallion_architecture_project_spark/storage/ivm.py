"""Incremental view maintenance — derived aggregates kept in sync by CDF.

The 100 TB reason the Change Data Feed exists: a derived aggregate (a Gold
revenue-by-group table, a per-source document census) should cost
O(changes) to keep current, not O(source) to rebuild. ``maintain_sum_view``
composes the storage layer's own pieces into that loop:

1. the feed is the source's row-level changes since the last APPLIED source
   version (insert / delete / update_preimage / update_postimage, from
   ``storage/cdf.py``);
2. the feed folds into per-group DELTAS — inserts and postimages add,
   deletes and preimages subtract, so an update contributes (new − old)
   and a no-op update contributes zero — one aggregation over the feed;
3. the deltas MERGE into the view (existing group: add; new group: insert)
   — a row-level ``merge_upsert`` touching only affected partitions, with
   the txn marker ``(app_id, batch_id = source head version)``.

Exactly-once without a separate cursor: the view's OWN txn marker is the
consumption cursor. The marker commits atomically with the view data, so
"applied but cursor not advanced" cannot exist — a retry after any crash
re-reads the marker, re-derives the identical feed range, and either
re-applies (first time) or no-ops (marker already at head). A file cursor
would reopen the window this closes: ack-after-apply with fresh source
commits in between double-counts the overlap.

This is the maintenance discipline of ``streaming/refresh.py``
(affected-day Gold rebuild) generalized: the refresh recomputes affected
partitions from source; IVM never touches source at all — the feed IS the
input. Sum/count (self-inverting) aggregates only; min/max need the
refresh path (a deleted minimum is not reconstructible from deltas), and
distinct-count/quantile views use the third leg of the maintenance family,
``streaming/sketch_refresh.py`` — mergeable HLL-register / DDSketch-bucket
state (append-only folds; deletes there likewise require recompute,
sketches are not invertible).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .cdf import table_changes
from .txnlog import TxnTable

__all__ = ["maintain_sum_view"]


def maintain_sum_view(
    src: TxnTable,
    view: TxnTable,
    spark: SparkSession,
    keys: list[str],
    group_col: str,
    sum_col: str,
) -> int:
    """Fold source changes since the view's applied marker into a
    (group, total, n_rows) view. Returns the number of view groups touched
    (0 when caught up)."""
    app_id = f"ivm/{os.path.basename(view.path.rstrip('/'))}"
    view_snap = view.snapshot()
    last = view_snap.txns.get(app_id, -1)
    head = src.snapshot().version
    if head <= last:
        return 0
    if last < 0:
        feed = src.read(spark, version=head).withColumn(
            "_change_type", F.lit("insert")
        )
    else:
        feed = table_changes(src, spark, keys, last, head)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        feed.withColumn("__sign", sign)
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.sum(F.col("__sign") * F.col(sum_col)).alias("d_total"),
            F.sum(F.col("__sign")).alias("d_rows"),
        )
        .filter((F.col("d_total") != 0) | (F.col("d_rows") != 0))
    )
    current = (
        view.read(spark).select("group", "total", "n_rows")
        if view_snap.version >= 0
        else None
    )
    if current is not None:
        merged = deltas.join(current, "group", "left").select(
            "group",
            (F.coalesce(F.col("total"), F.lit(0)) + F.col("d_total")).alias("total"),
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")).alias("n_rows"),
        )
    else:
        merged = deltas.select(
            "group",
            F.col("d_total").alias("total"),
            F.col("d_rows").alias("n_rows"),
        )
    n = merged.count()
    if n:
        view.merge_upsert(
            spark,
            merged,
            keys=["group"],
            partition_col="group",
            app_id=app_id,
            batch_id=head,
        )
    return n
