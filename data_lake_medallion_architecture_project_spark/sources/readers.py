"""Source readers.

Replaces the reference's per-file eager reads:

* ``pd.read_csv`` per Bronze file with inferred schema
  (``/root/reference/pipeline/bronze_to_silver.py:205-209``) → one declarative
  ``spark.read.csv`` over the whole path list with a declared schema and
  PERMISSIVE mode (corrupt rows land in ``_corrupt_record`` instead of killing
  the batch).
* ``rglob("*.parquet")`` + ``pd.concat``
  (``/root/reference/storage/local_storage.py:129-137``) → a single
  ``spark.read.parquet`` over the directory tree; Spark's partition discovery
  reads Hive-style ``year=/month=/day=`` layouts natively and prunes them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import BRONZE_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) as a DataFrame.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's reader rejects
    unless the legacy nanos-as-long conf is set; we set it only when the plain
    read actually fails (so a session that never touches nanos parquet is
    never mutated), and rebuild the timestamp at microsecond precision with
    integer arithmetic — nano values (~1.7e18) overflow double, so the
    division must stay integral.

    The conf deliberately stays set afterwards: the returned DataFrame is
    lazy, and the scan re-reads the conf at execution time, so restoring it
    here would break the very plan we return. The one observable side effect
    is that later nanos-parquet reads in the same session also come back as
    bigint — which this function already normalizes.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            df = spark.read.parquet(path)
        except Exception:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Floor a TINY scan's parallelism at the session's core count (round 15,
    guide §2 "make partitioning scale-adaptive").

    A parquet row group is indivisible, so a small file (the sf0.001-0.1
    test tables are ONE row group) yields one scan task and every scan-side
    map stage — tokenize/explode/md5 partial-agg chains — runs single-core
    however many cores the session has. The repartition fires ONLY when the
    scan has fewer partitions than ``defaultParallelism``, i.e. when the
    input is at most ~cores × maxPartitionBytes (a few GB); shuffling a
    corpus that small is trivial on any cluster, and on a real 100 TB scan
    the condition is false and the plan is UNCHANGED — this is an input-size
    floor, not a local-mode constant. (Spark's own
    ``spark.sql.files.minPartitionNum`` cannot do this: byte-range splits
    of a single row group all map to the row group's midpoint task.)

    Use on frames whose downstream map work is heavy per row AND consumed
    by few branches — measured round 15: bpe_encoded_token_counts 1.74 →
    0.5 s, substring_excised_documents 3.09 → 2.4 s, but every multi-branch
    consumer regressed (doc_lm_perplexity +1.6 s, frequent_bigrams +1.2 s:
    each branch re-pays the exchange and the extra stage boundaries beat
    the parallelism win), so those stay unspread. For id-only
    payload-synthesis catalogs use the unconditional id-spread in
    plans/extensions.py instead."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def read_bronze_csv(
    spark: SparkSession,
    paths: list[str] | str,
    domain: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read Bronze CSV files for a domain with a declared schema.

    PERMISSIVE mode gives the per-file error tolerance the reference implements
    with try/except-and-skip (bronze_to_silver.py:204-209), but at row rather
    than file granularity — a single bad row no longer discards its whole file.
    """
    schema = schema or BRONZE_SCHEMAS[domain]
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("recursiveFileLookup", "true")
        .csv(paths)
    )


def read_silver(spark: SparkSession, silver_root: str, domain: str) -> DataFrame:
    """Read the full Silver tree for a domain (one scan, partition-discovered).

    Mirrors ``read_from_silver`` (local_storage.py:129-137) incl. its
    empty-input contract: missing/empty directory → empty DataFrame.
    """
    path = os.path.join(silver_root, domain)
    try:
        df = spark.read.option("mergeSchema", "false").parquet(path)
    except Exception:
        # Path does not exist yet — the reference returns an empty frame here.
        return spark.createDataFrame([], StructType([]))
    # Streaming ingest writes each micro-batch under ingest_batch=<id> for
    # idempotent replay; that bookkeeping partition is not part of the Silver
    # row contract.
    if "ingest_batch" in df.columns:
        df = df.drop("ingest_batch")
    return df
