"""Declarative data-quality checks — a Deequ-style constraint suite.

The reference hard-codes its validation rules inside each Silver cleaner
(``/root/reference/pipeline/bronze_to_silver.py``); this operator is the
engine-level generalization: a table-agnostic check vocabulary whose metrics
are computed in ONE aggregation pass per table (every check compiles to an
aggregate expression over the same scan — adding a check adds a column to
the agg, not a job), plus referential-integrity checks that compile to an
anti-join count.

Check vocabulary:

* ``not_null(col)`` — violations = rows with NULL col
* ``unique(col)`` — violations = rows beyond the first per value
* ``in_set(col, values)`` — violations = non-NULL values outside the set
* ``in_range(col, lo, hi)`` — violations = non-NULL values outside [lo, hi]
* ``matches(col, regex)`` — violations = non-NULL values not matching
* ``fk(col, ref_df, ref_col)`` — violations = rows whose col has no match in
  ref (NULL FK counts as a violation only if ``not_null`` is also declared)

Output: one row per check — (check_name, violations, passed). At 100 TB the
aggregate checks cost one scan of the table with map-side partials; each FK
check is a left-anti join that broadcasts whichever side AQE finds small
(typically the distinct reference keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    col: str = ""
    params: tuple = field(default_factory=tuple)


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "not_null", col)


def unique(col: str) -> Check:
    return Check(f"unique({col})", "unique", col)


def in_set(col: str, values: tuple) -> Check:
    return Check(f"in_set({col})", "in_set", col, tuple(values))


def in_range(col: str, lo, hi) -> Check:
    return Check(f"in_range({col})", "in_range", col, (lo, hi))


def matches(col: str, regex: str) -> Check:
    return Check(f"matches({col})", "matches", col, (regex,))


def _violation_expr(c: Check) -> Column:
    x = F.col(c.col)
    if c.kind == "not_null":
        return F.count(F.lit(1)) - F.count(x)
    if c.kind == "unique":
        return F.count(x) - F.count_distinct(x)
    if c.kind == "in_set":
        bad = x.isNotNull() & ~x.isin(*c.params)
        return F.sum(bad.cast("long"))
    if c.kind == "in_range":
        lo, hi = c.params
        bad = x.isNotNull() & ((x < F.lit(lo)) | (x > F.lit(hi)))
        return F.sum(bad.cast("long"))
    if c.kind == "matches":
        (regex,) = c.params
        bad = x.isNotNull() & ~x.rlike(regex)
        return F.sum(bad.cast("long"))
    raise ValueError(f"unknown check kind: {c.kind}")


def quality_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all aggregate checks in one pass; (check_name, violations, passed).

    ``violations`` is 0-coalesced so an empty table passes every check
    (vacuous truth, matching Deequ semantics).
    """
    aggs = [
        F.coalesce(_violation_expr(c), F.lit(0)).cast("long").alias(f"c{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args})".format(
            n=len(checks),
            args=", ".join(f"'{c.name}', c{i}" for i, c in enumerate(checks)),
        )
    ).alias("check_name", "violations")
    return row.select(stack).select(
        "check_name", "violations", (F.col("violations") == 0).alias("passed")
    )


def fk_report(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str, name: str | None = None
) -> DataFrame:
    """Referential-integrity check: rows of ``df`` whose non-NULL ``col`` has
    no match in ``ref.ref_col``. Anti-join against the distinct reference
    keys (broadcast-eligible)."""
    name = name or f"fk({col})"
    keys = ref.select(F.col(ref_col).alias(col)).distinct()
    orphans = (
        df.select(col).filter(F.col(col).isNotNull()).join(keys, col, "left_anti")
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(name).alias("check_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
