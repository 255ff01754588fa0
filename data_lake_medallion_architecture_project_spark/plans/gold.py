"""Silver→Gold aggregate builders — the reference's seven Gold tables (A1-A7)
over the reference domain schemas.

Mirrors ``/root/reference/pipeline/silver_to_gold.py``: each builder takes the
full Silver frame (valid + invalid rows), filters ``is_valid``, derives the
day-grain date, aggregates, and stamps a run-constant ``generated_at``.

pandas-parity notes (SURVEY.md §2.5 / §7.4):

* pandas ``.round(2)`` is half-even → ``F.bround``;
* pandas ``groupby`` drops NaN group keys → explicit non-null filters on every
  group key;
* pandas ``nunique``/``count`` exclude NaN → ``countDistinct`` / ``F.count(col)``
  match natively;
* the A7 pivot passes the explicit movement-type value list and force-adds
  missing columns as 0 (silver_to_gold.py:199-202).

All builders are one-shuffle hash aggregates; the shared pre-aggregation
(filter + date derivation) stays unmaterialized so Catalyst fuses it into each
aggregate's scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOVEMENT_TYPES = ("inbound", "outbound", "adjustment")


def _valid_with_date(df: DataFrame, *group_keys: str) -> DataFrame:
    out = (
        df.filter(F.col("is_valid"))
        .withColumn("date", F.to_date("timestamp"))
        .filter(F.col("date").isNotNull())
    )
    for k in group_keys:
        out = out.filter(F.col(k).isNotNull())
    return out


def build_daily_sales_summary(sales_silver: DataFrame) -> DataFrame:
    """A1 (silver_to_gold.py:47-59)."""
    return (
        _valid_with_date(sales_silver)
        .groupBy("date")
        .agg(
            F.bround(F.sum("total_amount"), 2).alias("total_revenue"),
            F.countDistinct("sale_id").alias("order_count"),
            F.bround(F.avg("total_amount"), 2).alias("avg_order_value"),
            F.countDistinct("customer_id").alias("unique_customers"),
        )
    )


def build_category_sales_summary(sales_silver: DataFrame) -> DataFrame:
    """A2 (silver_to_gold.py:62-73)."""
    return (
        _valid_with_date(sales_silver, "category")
        .groupBy("date", "category")
        .agg(
            F.bround(F.sum("total_amount"), 2).alias("category_revenue"),
            F.countDistinct("sale_id").alias("category_orders"),
            F.bround(F.avg("unit_price"), 2).alias("avg_unit_price"),
        )
    )


def build_payment_method_summary(sales_silver: DataFrame) -> DataFrame:
    """A3 (silver_to_gold.py:76-86)."""
    return (
        _valid_with_date(sales_silver, "payment_method")
        .groupBy("date", "payment_method")
        .agg(
            F.bround(F.sum("total_amount"), 2).alias("payment_revenue"),
            F.countDistinct("sale_id").alias("payment_count"),
        )
    )


def build_customer_activity_summary(events_silver: DataFrame) -> DataFrame:
    """A4 (silver_to_gold.py:119-129)."""
    return (
        _valid_with_date(events_silver, "event_type")
        .groupBy("date", "event_type")
        .agg(
            F.count("event_id").alias("event_count"),
            F.countDistinct("customer_id").alias("unique_customers"),
            F.countDistinct("session_id").alias("unique_sessions"),
        )
    )


def build_device_usage_summary(events_silver: DataFrame) -> DataFrame:
    """A5 (silver_to_gold.py:131-141)."""
    return (
        _valid_with_date(events_silver, "device_type")
        .groupBy("date", "device_type")
        .agg(
            F.countDistinct("session_id").alias("session_count"),
            F.count("event_id").alias("event_count"),
        )
    )


def build_inventory_movement_summary(inventory_silver: DataFrame) -> DataFrame:
    """A6 (silver_to_gold.py:175-186); quantity re-coerced like line 172."""
    return (
        _valid_with_date(
            inventory_silver, "product_id", "product_name", "warehouse_id", "movement_type"
        )
        .withColumn("quantity", F.col("quantity").cast("double"))
        .groupBy("date", "product_id", "product_name", "warehouse_id", "movement_type")
        .agg(
            F.bround(F.sum("quantity"), 2).alias("total_quantity"),
            F.bround(F.sum("unit_cost"), 2).alias("total_cost"),
            F.count("movement_id").alias("movement_count"),
        )
    )


def build_inventory_net_position(inventory_silver: DataFrame) -> DataFrame:
    """A7 (silver_to_gold.py:189-207): pivot with explicit value list, fill 0,
    net_position = inbound − outbound."""
    pivoted = (
        _valid_with_date(inventory_silver, "product_id", "product_name", "warehouse_id")
        .withColumn("quantity", F.col("quantity").cast("double"))
        .groupBy("date", "product_id", "product_name", "warehouse_id")
        .pivot("movement_type", list(MOVEMENT_TYPES))
        .agg(F.sum("quantity"))
    )
    filled = reduce(
        lambda acc, t: acc.withColumn(t, F.coalesce(F.col(t), F.lit(0.0))),
        MOVEMENT_TYPES,
        pivoted,
    )
    return filled.withColumn("net_position", F.col("inbound") - F.col("outbound"))


GOLD_BUILDERS = {
    "daily_sales_summary": ("sales", build_daily_sales_summary),
    "category_sales_summary": ("sales", build_category_sales_summary),
    "payment_method_summary": ("sales", build_payment_method_summary),
    "customer_activity_summary": ("customer_events", build_customer_activity_summary),
    "device_usage_summary": ("customer_events", build_device_usage_summary),
    "inventory_movement_summary": ("inventory", build_inventory_movement_summary),
    "inventory_net_position": ("inventory", build_inventory_net_position),
}


def build_all_gold(silver_frames: dict[str, DataFrame], generated_at: str) -> dict[str, DataFrame]:
    """Build every Gold table available given the Silver frames present.

    Mirrors ``run()`` (silver_to_gold.py:219-235) incl. the empty-input guard:
    a missing/empty domain simply skips its tables.
    """
    out: dict[str, DataFrame] = {}
    for table, (domain, builder) in GOLD_BUILDERS.items():
        df = silver_frames.get(domain)
        if df is None or df.isEmpty():
            continue
        out[table] = builder(df).withColumn("generated_at", F.lit(generated_at))
    return out
