"""Bucketed tables — shuffle-free co-located joins for repeated fact⋈fact.

At 100 TB the orders⋈lineitem shuffle is the dominant cost of every query
that touches both. Writing both tables bucketed (and sorted) on the join key
pays that shuffle ONCE at write time; every subsequent join is a zero-
exchange SortMergeJoin over co-located buckets. This module wraps the
``bucketBy`` table write (bucketed layout is a table-catalog property, so
these go through ``saveAsTable`` with an explicit external path, not plain
``parquet()``).

Rules that make bucketing actually work (all encoded here, verified by
tests/test_bucketing.py asserting the join plan has no Exchange):

* both sides bucketed on the SAME key with the SAME bucket count;
* ``sortBy`` the key so the merge join needs no per-task sort;
* ``spark.sql.sources.bucketing.enabled`` stays on (default) and the join
  key equals the bucket key exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted parquet table."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (``on`` is a join
    condition or column name, passed through) — the planner emits a
    SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
