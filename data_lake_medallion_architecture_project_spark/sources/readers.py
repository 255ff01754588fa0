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
    unless the legacy nanos-as-long conf is set; we set it dynamically (it is
    a runtime SQL conf, so this works on any caller-provided session) and
    rebuild the timestamp at microsecond precision with integer arithmetic —
    nano values (~1.7e18) overflow double, so the division must stay integral.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


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
        return spark.read.option("mergeSchema", "false").parquet(path)
    except Exception:
        # Path does not exist yet — the reference returns an empty frame here.
        return spark.createDataFrame([], StructType([]))
