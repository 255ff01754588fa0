"""Keyed table diff — data reconciliation for migrations and replica audits.

The operational question every engine swap (including "switch from the
reference pipeline to this repo") has to answer: do two tables that should
agree actually agree, and where not, how? Row-by-row, keyed:

* ``left_only``  — key present only in the left table (a delete, or a
  right-side load gap),
* ``right_only`` — key present only in the right table (an insert),
* ``changed``    — key in both but some compared column differs
  (null-safely: NULL vs value counts as a change, NULL vs NULL does not).

Plan shape: one full outer join on the key — each side shuffles once on
the key it is (or should be) already bucketed by, so with bucketed/
co-partitioned tables the exchange disappears entirely; the comparison is
a JVM conjunction of null-safe equality predicates inside whole-stage
codegen (no row hashing round-trip through strings); the output is
diff-sized, which for a healthy replica is ~0 rows. Matching rows are
dropped before anything aggregates, so at 100 TB the operator's cost is
the join itself — the floor for exact reconciliation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "diff_summary"]


def table_diff(
    left: DataFrame, right: DataFrame, keys: list[str], compare: list[str] | None = None
) -> DataFrame:
    """Rows where ``left`` and ``right`` disagree: (keys..., status).

    ``compare`` defaults to every shared non-key column. Rows equal on all
    compared columns (null-safely) are dropped."""
    if compare is None:
        shared = set(left.columns) & set(right.columns)
        compare = [c for c in left.columns if c in shared and c not in keys]
    l = left.select(*keys, *[F.col(c).alias(f"_l_{c}") for c in compare])
    r = right.select(*keys, *[F.col(c).alias(f"_r_{c}") for c in compare])
    # Presence: any left-side column non-null is not enough (a genuinely NULL
    # row would look absent) — carry explicit presence flags instead.
    l = l.withColumn("_l_present", F.lit(True))
    r = r.withColumn("_r_present", F.lit(True))
    j = l.join(r, on=keys, how="full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")) for c in compare],
        F.lit(True),
    )
    status = (
        F.when(F.col("_r_present").isNull(), "left_only")
        .when(F.col("_l_present").isNull(), "right_only")
        .when(~same, "changed")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def diff_summary(diff: DataFrame, keys: list[str]) -> DataFrame:
    """(status, n, min/max key) — the audit-log row a reconciliation job
    emits. Key extremes give an operator a place to start digging without
    materializing the full diff."""
    k = keys[0]
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("first_key"),
        F.max(k).alias("last_key"),
    )
