"""Trainer-facing shard export — JSONL, the lingua franca of LLM data loaders.

The last hop of a training-data pipeline: the curated/packed corpus leaves
the lakehouse as newline-delimited JSON shards that a data loader streams
sequentially (WebDataset/HuggingFace-style). Two contracts matter at 100 TB
and both are handled Spark-side, not by a driver loop:

* **Deterministic shard membership.** A row's shard is ``md5(key) mod
  n_shards`` — stable across runs, retries, and cluster sizes, so a resumed
  export or an incremental re-export places every document in the same shard
  (no rand(), no ingest-order dependence). Within a shard, rows are sorted by
  the same hash, giving a deterministic, globally-shuffled training order
  (documents from the same source land far apart) without a global sort.
* **One write job, n_shards directories.** ``partitionBy("shard")`` writes
  ``shard=i/`` directories in a single distributed job; each shard is
  written by the executor that owns it after one hash repartition — the
  driver never sees a row.

The reference's export surface is single-file CSV
(``/root/reference/storage/local_storage.py:33-41``); this is its
training-pipeline generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Assign each row a deterministic shard in [0, n_shards) by md5(key).

    conv() of the first 15 hex chars (60 bits — within BIGINT range) gives a
    uniform non-negative integer; mod n_shards is the shard. Pure JVM
    expressions, map-only."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10)
    return df.withColumn("shard", (h.cast("long") % n_shards).cast("int"))


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    key: str = "doc_id",
    n_shards: int = 8,
    compression: str | None = None,
) -> None:
    """Export ``df`` as ``shard=i/`` JSONL directories under ``path``.

    One hash repartition co-locates each shard on one task (so a shard is a
    handful of part files, not one per upstream partition), and
    ``sortWithinPartitions`` fixes the in-shard order to the membership hash
    — the deterministic global shuffle trainers want. ``compression`` may be
    "gzip"/"zstd"/None; shards stay independently decodable either way."""
    # Sort key (shard, md5): the partitioned file write REQUIRES rows ordered
    # by the partition column and will insert its own sort (clobbering any
    # other in-partition order) unless the child's ordering already has the
    # partition column as a prefix — so the membership hash rides second.
    sharded = with_shard(df, key, n_shards)
    writer = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", F.md5(F.col(key).cast("string")))
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_shards(
    spark: SparkSession, path: str, schema=None, shards: list[int] | None = None
) -> DataFrame:
    """Read an exported shard tree back. ``shards`` prunes to specific
    shard directories via the partition column (a directory prune, not a
    scan-and-filter); ``schema`` pins types so a reread never re-infers."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("basePath", path).json(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin(shards))
    return df
