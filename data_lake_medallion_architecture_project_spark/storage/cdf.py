"""Change Data Feed — row-level changes between two versions of a TxnTable.

Delta's ``table_changes()`` surface, reconstructed from what the log
already knows instead of extra CDC files at write time: the commit range
names exactly which partitions' file sets changed, both snapshot versions
read ONLY those partitions (file-pruned from log metadata — untouched
history is never scanned), and a keyed diff classifies every row:

* ``insert``            — key only in the newer snapshot,
* ``delete``            — key only in the older snapshot,
* ``update_preimage`` / ``update_postimage`` — both rows of a changed key
  (Delta's convention: downstream consumers get old and new values).

Cost: O(touched partitions + diff), not O(table) — a compaction-only range
reads the rewritten partitions and correctly emits zero rows (compaction
moves bytes, not rows). This is the feed a downstream incremental consumer
(a Gold refresh, a search-index updater, a reverse-ETL sync) polls instead
of re-scanning the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tablediff import table_diff
from .txnlog import TxnTable

__all__ = ["table_changes"]


def table_changes(
    table: TxnTable,
    spark: SparkSession,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows changed between ``from_version`` (exclusive state: the feed
    describes how to get FROM it) and ``to_version`` (default: head), with
    a ``_change_type`` column."""
    s0 = table.snapshot(from_version)
    s1 = table.snapshot(to_version)
    # A deletion-vector commit changes NO files — its row-level deletes
    # surface only through the DV set, so partitions covered by DVs that
    # appeared (or vanished, e.g. RESTORE's dv_reset) in the range count
    # as touched too.
    dv_delta = (set(s0.dvs) ^ set(s1.dvs))
    dv_parts = {
        p
        for dv in dv_delta
        for p in (s0.dvs.get(dv) or s1.dvs.get(dv) or [])
    }
    touched = sorted(
        {pv for f, pv in s0.files.items() if s1.files.get(f) != pv}
        | {pv for f, pv in s1.files.items() if s0.files.get(f) != pv}
        | dv_parts
    )
    old = table.read(spark, partition_values=touched, version=s0.version)
    new = table.read(spark, partition_values=touched, version=s1.version)
    diff = table_diff(old, new, keys)

    def _pick(src: DataFrame, status: str, change_type: str) -> DataFrame:
        marked = diff.filter(F.col("status") == status).select(*keys)
        return src.join(F.broadcast(marked), keys, "left_semi").withColumn(
            "_change_type", F.lit(change_type)
        )

    return (
        _pick(new, "right_only", "insert")
        .unionByName(_pick(old, "left_only", "delete"))
        .unionByName(_pick(old, "changed", "update_preimage"))
        .unionByName(_pick(new, "changed", "update_postimage"))
    )


def consume_changes(
    table: TxnTable,
    spark: SparkSession,
    keys: list[str],
    cursor_path: str,
) -> tuple[DataFrame, int]:
    """Incremental CDF consumption: changes since the last consumed version,
    plus the head version to acknowledge.

    The consumer loop a downstream sync runs:

        feed, head = consume_changes(table, spark, keys, cursor)
        ... apply feed ...
        ack_changes(cursor, head)          # AFTER the apply durably lands

    The cursor is a plain version number in a file, advanced only by
    ``ack_changes`` — crash between apply and ack replays the same range
    (at-least-once), so consumers make the apply idempotent (keyed upserts
    downstream make that free). First call replays from the beginning
    (cursor −1 = everything is an insert)."""
    import os

    last = -1
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            last = int(fh.read().strip())
    head = table.snapshot().version
    if head <= last:
        empty = table.read(spark, partition_values=[])
        return empty.withColumn("_change_type", F.lit("")).limit(0), head
    if last < 0:
        base = table.read(spark, version=head)
        return base.withColumn("_change_type", F.lit("insert")), head
    return table_changes(table, spark, keys, last, head), head


def ack_changes(cursor_path: str, version: int) -> None:
    """Durably advance the consumer cursor (write-then-rename atomic)."""
    import os
    import uuid

    tmp = cursor_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, cursor_path)
