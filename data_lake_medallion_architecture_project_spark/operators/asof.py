"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, key, ts)`` attaches, to every left row, the greatest
right-side timestamp ≤ the left row's timestamp within the same key — the
classic "state as of event time" join (DuckDB/kdb ``ASOF JOIN``).

Implementation is the union-merge pattern, NOT a range join:

1. union left and right rows into one stream tagged by side;
2. one shuffle, partitioned by key, sorted by (ts, side) — right rows sort
   before left rows at equal timestamps so ties count as "≤";
3. running ``last(right_ts, ignorenulls=True)`` window carries the most recent
   right timestamp forward;
4. keep only left rows.

Cost: a single shuffle of |left|+|right| rows and a sort within partitions —
linear, skew-handled by AQE. A naive conditional join (``l.key = r.key AND
r.ts <= l.ts`` + max) is quadratic per key and falls over at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: all left columns + ``out_col`` = greatest right ``ts``
    ≤ left ``ts`` for the same ``key`` (NULL if no earlier right row)."""
    left_cols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__rts", F.lit(None).cast(left.schema[ts].dataType))
    r = (
        right.select(key, ts)
        .withColumn("__side", F.lit(0))
        .withColumn("__rts", F.col(ts))
    )
    # Align schemas: right rows carry nulls for the other left columns.
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = l.select(*left_cols, "__side", "__rts").unionByName(
        r.select(*left_cols, "__side", "__rts")
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(out_col, F.last("__rts", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(*left_cols, out_col)
    )
