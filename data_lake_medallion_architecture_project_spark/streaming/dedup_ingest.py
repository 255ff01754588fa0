"""Streaming dedup ingest — exactly-once, first-write-wins document intake.

The streaming realization of ``incremental_dedup_new_batch``
(plans/curation.py): documents arrive as files, and the corpus must end up
holding exactly one copy of every distinct text, no matter how batches
interleave, duplicate, or replay after a crash. Composition of three pieces
this repo already trusts:

1. **File-source checkpoint** (``Trigger.AvailableNow``) — which source
   files have been consumed is exactly-once accounted by Structured
   Streaming.
2. **Within-batch collapse** — one row per content hash, smallest id wins
   (deterministic under replay).
3. **Cross-batch dedup + append in ONE atomic commit** — the batch's hashes
   anti-join the table's CURRENT snapshot (hash-keyed, so only hashes move;
   never corpus text), and survivors ``merge_upsert`` into the
   ``TxnTable`` with the (app_id, batch_id) idempotency marker. A crash
   between table commit and checkpoint advance replays the batch; the
   marker makes the replay a no-op, so a document can never land twice.

The table is partitioned by the first hex nibble of the content hash —
16 uniformly-loaded partitions regardless of document skew (hash
partitioning is the classic fix for hot-key append). At 100 TB the
anti-join side is the hash column of the corpus table: a column-pruned
scan of a few bytes per document, the same shape
``incremental_dedup_new_batch`` promises.

Dedup here is EXACT (content hash). For near-dup intake, chain
``operators/dedup_index.query_minhash_index`` in front: drop batch rows
whose est_jaccard against the corpus index exceeds the threshold, then
ingest the remainder through this same exactly-once door.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage import TxnTable

_HASH_COL = "content_hash"
_PART_COL = "hash_shard"


def _hashed(df: DataFrame, text_col: str) -> DataFrame:
    h = F.md5(F.col(text_col).cast("binary"))
    return df.withColumn(_HASH_COL, h).withColumn(
        _PART_COL, F.substring(_HASH_COL, 1, 1)
    )


def dedup_batch_against_table(
    spark: SparkSession,
    table: TxnTable,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    app_id: str,
    batch_id: int,
) -> None:
    """Apply one micro-batch: collapse to one row per content hash (min id
    wins), drop hashes the table already holds, append the rest atomically
    with the idempotency marker."""
    hashed = _hashed(batch_df, text_col)
    # Within-batch first-write-wins: argmin by id via struct-min.
    ordered = [id_col] + [c for c in hashed.columns if c not in (id_col, _HASH_COL, _PART_COL)]
    collapsed = (
        hashed.groupBy(_HASH_COL, _PART_COL)
        .agg(F.min(F.struct(*ordered)).alias("_s"))
        .select(_HASH_COL, _PART_COL, *[F.col(f"_s.{c}").alias(c) for c in ordered])
    )
    snap = table.snapshot()
    if snap.version >= 0 and snap.files:
        seen = table.read(spark).select(_HASH_COL)
        collapsed = collapsed.join(seen, _HASH_COL, "left_anti")
    # merge_upsert keyed on the hash: after the anti-join everything is an
    # insert, and the key guarantees uniqueness even against a concurrent
    # writer that slipped in between the snapshot and the commit (the txn
    # layer's conflict detection raises rather than double-inserting).
    table.merge_upsert(
        spark,
        collapsed,
        keys=[_HASH_COL],
        partition_col=_PART_COL,
        app_id=app_id,
        batch_id=batch_id,
    )


def run_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Consume all not-yet-seen document files into the deduped corpus
    table. Returns the number of micro-batches applied this invocation."""
    schema = spark.read.parquet(source_dir).schema
    table = TxnTable(table_path)
    app_id = f"dedup_ingest/{os.path.basename(table_path.rstrip('/'))}"
    applied = {"n": 0}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_against_table(
            spark, table, batch_df, id_col, text_col, app_id, int(batch_id)
        )
        applied["n"] += 1

    query = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(checkpoint_root, "dedup_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return applied["n"]
