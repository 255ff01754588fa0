"""SCD Type 2 — business-time history over the transactional table layer.

The lakehouse dimension-tracking pattern: instead of overwriting an entity's
attributes on change, every version is kept as its own row with a
``[valid_from, valid_to)`` interval and an ``is_current`` flag. The txn log
already gives SYSTEM-time travel (what did the table contain at version v);
SCD2 adds BUSINESS-time travel (what were this customer's attributes on
March 3rd) — the two are orthogonal and compose.

Built entirely on ``TxnTable.merge_upsert`` with the composite key
(business keys + valid_from): closing an old version (stamp ``valid_to``,
clear ``is_current``) and inserting the new current version are both plain
keyed upserts, so SCD2 inherits the layer's atomicity, optimistic
concurrency, (app_id, batch_id) exactly-once markers, and partition-scoped
O(affected-partitions) cost — no new commit machinery.

Change-application policy (the standard ordered-loader contract):
* a batch is collapsed to the latest change per key first (struct-max
  argmax — deterministic under ties);
* a change older than the key's current ``valid_from`` is stale and is
  dropped (late replays cannot rewrite closed history);
* a change equal on every tracked attribute is a no-op (no empty versions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.upsert import latest_per_key
from .txnlog import TxnTable

__all__ = ["scd2_apply", "scd2_current", "scd2_asof", "scd2_pit_join"]


def scd2_apply(
    table: TxnTable,
    spark: SparkSession,
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    partition_col: str,
    app_id: str | None = None,
    batch_id: int | None = None,
    tracked: list[str] | None = None,
) -> int:
    """Fold a change batch into the history table. ``changes`` carries the
    business keys, the tracked attributes, ``order_col`` (the business-time
    of the change, renamed to ``valid_from``) and ``partition_col``.
    ``tracked`` is the set of columns whose change opens a new version —
    defaulting to everything but keys/order/partition (the partition column
    may derive from business time, so comparing it would turn every
    timestamp tick into a phantom version). Returns the number of new
    version rows written (0 for a fully-stale/no-op/replayed batch)."""
    latest = latest_per_key(changes, keys, order_col)
    attrs = [c for c in latest.columns if c not in keys and c != order_col]
    if tracked is None:
        tracked = [c for c in attrs if c != partition_col]
    incoming = latest.select(
        *keys,
        *attrs,
        F.col(order_col).alias("valid_from"),
        F.lit(None).cast(dict(latest.dtypes)[order_col]).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    snap = table.snapshot()
    if snap.version < 0:
        new_versions = incoming
    else:
        current = table.read(spark).filter("is_current")
        cur = current.select(
            *keys,
            F.col("valid_from").alias("_cur_from"),
            F.struct(*[F.col(a) for a in tracked]).alias("_cur_attrs"),
        )
        joined = incoming.join(cur, keys, "left")
        fresh = joined.filter(
            F.col("_cur_from").isNull()  # brand-new key
            | (
                (F.col("valid_from") > F.col("_cur_from"))  # not stale
                & ~F.struct(*[F.col(a) for a in tracked]).eqNullSafe(
                    F.col("_cur_attrs")
                )  # actually changed
            )
        )
        new_versions = fresh.select(*incoming.columns)
        closed = (
            fresh.filter(F.col("_cur_from").isNotNull())
            .select(*keys, F.col("_cur_from").alias("valid_from"),
                    F.col("valid_from").alias("_close_at"))
            .join(current, [*keys, "valid_from"])
            .withColumn("valid_to", F.col("_close_at"))
            .withColumn("is_current", F.lit(False))
            .drop("_close_at")
            .select(*incoming.columns)
        )
        new_versions = new_versions.unionByName(closed)

    n = new_versions.count()
    if n == 0:
        return 0
    table.merge_upsert(
        spark,
        new_versions,
        keys=[*keys, "valid_from"],
        partition_col=partition_col,
        app_id=app_id,
        batch_id=batch_id,
    )
    return n


def scd2_current(table: TxnTable, spark: SparkSession) -> DataFrame:
    """The dimension as of now: one row per key."""
    return table.read(spark).filter("is_current")


def scd2_asof(table: TxnTable, spark: SparkSession, ts) -> DataFrame:
    """Business-time travel: each key's attributes as of ``ts`` —
    the version whose [valid_from, valid_to) interval covers it."""
    t = F.lit(ts)
    return table.read(spark).filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_pit_join(
    facts: DataFrame,
    table: TxnTable,
    spark: SparkSession,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time enrichment — THE consumption pattern SCD2 exists for:
    each fact row picks up the dimension attributes that were valid at the
    fact's own business time (training-data labeling, feature backfills,
    and revenue attribution all need "the customer's segment AS OF the
    order date", not today's).

    Implemented as the as-of union-merge (``operators/asof.py``) on
    ``valid_from``: one shuffle of |facts| + |versions| rows — never the
    quadratic key ⋈ interval-containment join — then one keyed equi-join
    back to the version row. A fact older than its key's first version
    keeps NULL attributes (left semantics). Interval correctness needs no
    upper-bound check: SCD2 versions are contiguous, so the greatest
    ``valid_from`` ≤ ts is exactly the version whose ``valid_to`` exceeds
    ts."""
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join

    sep = chr(31)  # unit separator: cannot occur in key casts
    synth = F.concat_ws(sep, *[F.col(k).cast("string") for k in keys])
    dim = table.read(spark)
    versions = dim.select(
        synth.alias("__pit_key"), F.col("valid_from").alias(ts_col)
    )
    tagged = facts.withColumn("__pit_key", synth)
    hit = asof_join(tagged, versions, "__pit_key", ts_col, out_col="__pit_from")
    dim_keyed = dim.select(
        synth.alias("__pit_key"),
        F.col("valid_from").alias("__pit_from"),
        *[c for c in dim.columns if c not in keys],
    )
    return hit.join(dim_keyed, ["__pit_key", "__pit_from"], "left").drop(
        "__pit_key", "__pit_from", "valid_from", "valid_to", "is_current"
    )
