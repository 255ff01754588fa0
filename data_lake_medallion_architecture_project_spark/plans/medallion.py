"""Medallion Gold-layer aggregates (A1-A7) re-expressed over the driver testdata.

The reference's query workload IS its seven Gold aggregate builds
(``/root/reference/pipeline/silver_to_gold.py:47-207``; SURVEY.md §2.5). The
driver's correctness gate runs on the TPC-H-ish testdata tables, so each Gold
build is mapped onto the semantically matching testdata table:

* A1 daily_sales_summary      → ``orders`` grouped by order date
* A2 category_sales_summary   → ``lineitem ⋈ part`` grouped by (date, brand)
* A3 payment_method_summary   → ``orders`` grouped by (date, orderpriority)
* A4 customer_activity_summary→ ``events`` grouped by (date, event_type)
* A5 device_usage_summary     → ``events`` grouped by date (daily rollup)
* A6 inventory_movement_summary → ``lineitem`` grouped by (date, flag, status)
* A7 inventory_net_position   → ``events`` pivoted on event_type with a
  derived net column (mirrors the inbound−outbound pivot at
  silver_to_gold.py:189-207, incl. the explicit pivot value list and fill-0)

Plus the Silver validation kernel (P3-P6, F7-F9 — bronze_to_silver.py:88-128)
as ``silver_validate_events``.

Scale notes: all aggregates are single-shuffle hash aggregations with map-side
partial aggregation; Catalyst pushes the column pruning into the parquet scan.
The one join (A2) broadcasts nothing by default — ``part`` is ~1/5 the size of
``lineitem`` and grows with SF, so it stays a shuffle join and AQE may demote
it to broadcast at small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import (
    dec_avg,
    dec_sum,
    decimal_sum,
    oracle_dec_avg,
    oracle_dec_sum,
    oracle_decimal_sum,
)
from ..schemas import EVENTS_EVENT_TYPES
from ..sources.readers import load_table
from .registry import register


def _day(col: str) -> F.Column:
    """Day-grain group key as DateType (4-byte comparison, cheap hash)."""
    return F.to_date(col).alias("date")


def _finish_date(df: DataFrame) -> DataFrame:
    """Render the day key as yyyy-MM-dd AFTER aggregation.

    Grouping on the DateType value and formatting only the result rows moves
    the (timezone-aware, pattern-parsing) date_format from |input| rows to
    |groups| rows — at 100 TB that's a per-row string build on billions of
    rows traded for thousands."""
    return df.withColumn("date", F.date_format("date", "yyyy-MM-dd"))

# --------------------------------------------------------------------------- #
# A1 — daily_sales_summary (silver_to_gold.py:47-59)
# --------------------------------------------------------------------------- #

_A1_ORACLE = f"""
SELECT
  strftime(o_orderdate, '%Y-%m-%d') AS date,
  {oracle_dec_sum("o_totalprice", "total_revenue")},
  COUNT(DISTINCT o_orderkey) AS order_count,
  {oracle_dec_avg("o_totalprice", "avg_order_value")},
  COUNT(DISTINCT o_custkey) AS unique_customers
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m-%d')
"""


@register("daily_sales_summary", oracle=_A1_ORACLE, tags=("bench", "gold"))
def daily_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: revenue / order count / AOV / distinct customers per day.

    Same two-phase shape as ``category_sales_summary`` (see its docstring):
    pre-aggregate on (date, custkey) so the remaining COUNT(DISTINCT
    o_custkey) becomes a plain COUNT(*) and no Expand duplicates the fact
    rows through the exchange. o_orderkey is the orders PK, so its distinct
    count is the plain row count (summed through the phases); the
    split-long money partials flow through both phases bit-identically."""
    from ..functions.money import _SPLIT, _SPLIT_BITS, _SPLIT_MASK

    orders = load_table(spark, sf_dir, "orders")
    price_scaled = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        orders.select(_day("o_orderdate"), "o_totalprice", "o_custkey")
        .groupBy("date", "o_custkey")
        .agg(
            F.sum(F.shiftright(price_scaled, _SPLIT_BITS)).alias("ph"),
            F.sum(price_scaled.bitwiseAND(F.lit(_SPLIT_MASK))).alias("pl"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    revenue = (
        F.sum("ph").cast("decimal(38,0)") * _SPLIT
        + F.sum("pl").cast("decimal(38,0)")
    ) / 100.0
    return _finish_date(
        per_cust.groupBy("date").agg(
            revenue.alias("total_revenue"),
            F.sum("n").cast("long").alias("order_count"),
            (revenue / F.sum("n")).alias("avg_order_value"),
            # count(col), not count(*): skips a NULL-custkey group, matching
            # COUNT(DISTINCT o_custkey) null semantics in the oracle.
            F.count("o_custkey").alias("unique_customers"),
        )
    )


# --------------------------------------------------------------------------- #
# A1-decimal — daily_sales_summary on the DecimalType(12,2) money path
# --------------------------------------------------------------------------- #

_A1_DECIMAL_ORACLE = f"""
SELECT
  strftime(o_orderdate, '%Y-%m-%d') AS date,
  {oracle_decimal_sum("o_totalprice", "total_revenue_dec")},
  COUNT(o_orderkey) AS order_count,
  {oracle_dec_avg("o_totalprice", "avg_order_value", precision=12)}
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m-%d')
"""


@register("daily_sales_summary_decimal", oracle=_A1_DECIMAL_ORACLE, tags=("gold", "bench"))
def daily_sales_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 on the flag-gated decimal money path (SURVEY §1.4's named upgrade):
    revenue aggregates as ``DecimalType(12,2)`` end-to-end instead of the
    scaled-long/double discipline. The exact decimal total is emitted as its
    fixed-scale string — the one rendering Spark and DuckDB print identically
    — so the gate hash-checks the DECIMAL value itself; avg_order_value
    derives from the same exact sum via double division, proving the decimal
    and double paths agree to the last ulp."""
    orders = load_table(spark, sf_dir, "orders")
    return _finish_date(
        orders.select(_day("o_orderdate"), "o_totalprice", "o_orderkey")
        .groupBy("date")
        .agg(
            decimal_sum("o_totalprice", "_rev"),
            F.count("o_orderkey").alias("order_count"),
            F.count("o_totalprice").alias("_n"),
        )
        .select(
            "date",
            F.col("_rev").cast("string").alias("total_revenue_dec"),
            "order_count",
            (F.col("_rev").cast("double") / F.col("_n")).alias("avg_order_value"),
        )
    )


# --------------------------------------------------------------------------- #
# A2 — category_sales_summary (silver_to_gold.py:62-73); category → p_brand
# --------------------------------------------------------------------------- #

_A2_ORACLE = f"""
SELECT
  strftime(l.l_shipdate, '%Y-%m-%d') AS date,
  p.p_brand AS category,
  {oracle_dec_sum("l.l_extendedprice", "category_revenue")},
  COUNT(DISTINCT l.l_orderkey) AS category_orders,
  {oracle_dec_avg("p.p_retailprice", "avg_unit_price")}
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY strftime(l.l_shipdate, '%Y-%m-%d'), p.p_brand
"""


@register("category_sales_summary", oracle=_A2_ORACLE, tags=("bench", "gold", "join"))
def category_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-day, per-brand revenue; exercises the fact⋈dim join.

    SINGLE-EXCHANGE two-phase distinct aggregation (round 9): one explicit
    repartition on the RESULT grain (date, category), then both phases —
    the (date, category, orderkey) pre-group that turns COUNT(DISTINCT)
    into COUNT(*), and the final aggregate — pipeline in-partition with no
    further exchange, because HashPartitioning on a subset of the grouping
    keys satisfies the superset's clustering requirement. History of this
    plan: Catalyst's mixed-distinct Expand form moved 29.5 MB over two
    shuffle rounds (r5); the r8 two-phase rewrite removed the Expand's row
    duplication but still paid two exchanges of the near-row-grain
    pre-aggregate (~30 MB — the (date, brand, orderkey) grain is ≈ row
    grain on lineitem, so partials cannot collapse); this form pays ONE
    exchange of the raw narrow rows (18.4 MB at sf0.1) and measured 2.1×
    faster than the r8 form at 100× (25.5 s vs 54.0 s interleaved),
    1.19× at sf0.1. At 100 TB the (date, brand) result grain keys the
    exchange — tens of thousands of groups, ample executor parallelism;
    the in-partition phase-1 hash may spill for huge day×brand slices,
    which the sort-based aggregation fallback absorbs. Money exactness is
    preserved by carrying scaled_long_sum's split-long partials
    (functions/money.py) through both phases — per-group long sums
    re-summed are bit-identical (long addition is associative), so the
    decimal recombination and the hash are unchanged."""
    from ..functions.money import _SPLIT, _SPLIT_BITS, _SPLIT_MASK

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        _day("l_shipdate"), "l_partkey", "l_orderkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey).select(
        "date",
        F.col("p_brand").alias("category"),
        "l_orderkey",
        "l_extendedprice",
        "p_retailprice",
    )
    rep = joined.repartition(F.col("date"), F.col("category"))
    price_scaled = F.round(F.col("l_extendedprice") * 100).cast("long")
    retail_scaled = F.round(F.col("p_retailprice") * 100).cast("long")
    per_order = rep.groupBy("date", "category", "l_orderkey").agg(
        F.sum(F.shiftright(price_scaled, _SPLIT_BITS)).alias("ph"),
        F.sum(price_scaled.bitwiseAND(F.lit(_SPLIT_MASK))).alias("pl"),
        F.sum(F.shiftright(retail_scaled, _SPLIT_BITS)).alias("rh"),
        F.sum(retail_scaled.bitwiseAND(F.lit(_SPLIT_MASK))).alias("rl"),
        F.count(F.lit(1)).alias("n"),
    )

    def _recombine(h: str, l: str) -> F.Column:
        return (
            F.sum(h).cast("decimal(38,0)") * _SPLIT
            + F.sum(l).cast("decimal(38,0)")
        ) / 100.0

    return _finish_date(
        per_order.groupBy("date", "category").agg(
            _recombine("ph", "pl").alias("category_revenue"),
            F.count(F.lit(1)).alias("category_orders"),
            (_recombine("rh", "rl") / F.sum("n")).alias("avg_unit_price"),
        )
    )


# --------------------------------------------------------------------------- #
# A3 — payment_method_summary (silver_to_gold.py:76-86); method → orderpriority
# --------------------------------------------------------------------------- #

_A3_ORACLE = f"""
SELECT
  strftime(o_orderdate, '%Y-%m-%d') AS date,
  o_orderpriority AS payment_method,
  {oracle_dec_sum("o_totalprice", "payment_revenue")},
  COUNT(DISTINCT o_orderkey) AS payment_count
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
"""


@register("payment_method_summary", oracle=_A3_ORACLE, tags=("gold",))
def payment_method_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: revenue and order count per day per priority class."""
    orders = load_table(spark, sf_dir, "orders")
    return _finish_date(
        orders.select(
            _day("o_orderdate"),
            F.col("o_orderpriority").alias("payment_method"),
            "o_totalprice",
            "o_orderkey",
        )
        .groupBy("date", "payment_method")
        .agg(
            dec_sum("o_totalprice", "payment_revenue"),
            # orders-PK rewrite: COUNT(DISTINCT pk) ≡ COUNT(pk), no Expand.
            F.count("o_orderkey").alias("payment_count"),
        )
    )


# --------------------------------------------------------------------------- #
# A4 — customer_activity_summary (silver_to_gold.py:119-129)
# --------------------------------------------------------------------------- #

_A4_ORACLE = """
SELECT
  strftime(ts, '%Y-%m-%d') AS date,
  event_type,
  COUNT(event_id) AS event_count,
  COUNT(DISTINCT user_id) AS unique_users,
  COUNT(DISTINCT props) AS unique_props
FROM events
GROUP BY strftime(ts, '%Y-%m-%d'), event_type
"""


@register("customer_activity_summary", oracle=_A4_ORACLE, tags=("bench", "gold"))
def customer_activity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: event count + distinct users/props per day per event type.

    TWO distinct columns + a plain count would Expand every event row ×3
    through the exchange (multi-distinct planning). Instead each distinct
    runs as its own pre-aggregated branch — (date, type, user) and
    (date, type, props) grains, where the outer COUNT(col) counts the
    non-null groups exactly like COUNT(DISTINCT col) counts non-null
    values — joined on the tiny (date, type) result grain. Trade: events
    is scanned twice (columnar, 4/3 pruned columns), but the 100 TB-scale
    events shuffle is never tripled, and each branch's exchange carries
    group-grain rows, not raw events."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(_day("ts"), "event_type", "event_id", "user_id", "props")
    users = (
        base.groupBy("date", "event_type", "user_id")
        .agg(F.count("event_id").alias("n"))
        .groupBy("date", "event_type")
        .agg(
            F.sum("n").cast("long").alias("event_count"),
            F.count("user_id").alias("unique_users"),
        )
    )
    props = (
        base.select("date", "event_type", "props")
        .distinct()
        .groupBy("date", "event_type")
        .agg(F.count("props").alias("unique_props"))
    )
    return _finish_date(users.join(props, ["date", "event_type"]))


# --------------------------------------------------------------------------- #
# A5 — device_usage_summary (silver_to_gold.py:131-141); daily rollup shape
# --------------------------------------------------------------------------- #

_A5_ORACLE = f"""
SELECT
  strftime(ts, '%Y-%m-%d') AS date,
  COUNT(event_id) AS event_count,
  COUNT(DISTINCT user_id) AS unique_users,
  {oracle_dec_sum("value", "total_value")}
FROM events
GROUP BY strftime(ts, '%Y-%m-%d')
"""


@register("daily_event_summary", oracle=_A5_ORACLE, tags=("gold",))
def daily_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 analog: whole-day event rollup (count, distinct users, value sum).

    Two-phase on (date, user) — same Expand-free shape as
    ``daily_sales_summary``; split-long value partials carry exactly."""
    from ..functions.money import _SPLIT, _SPLIT_BITS, _SPLIT_MASK

    events = load_table(spark, sf_dir, "events")
    value_scaled = F.round(F.col("value") * 100).cast("long")
    per_user = (
        events.select(_day("ts"), "event_id", "user_id", "value")
        .groupBy("date", "user_id")
        .agg(
            F.count("event_id").alias("n"),
            F.sum(F.shiftright(value_scaled, _SPLIT_BITS)).alias("vh"),
            F.sum(value_scaled.bitwiseAND(F.lit(_SPLIT_MASK))).alias("vl"),
        )
    )
    total_value = (
        F.sum("vh").cast("decimal(38,0)") * _SPLIT
        + F.sum("vl").cast("decimal(38,0)")
    ) / 100.0
    return _finish_date(
        per_user.groupBy("date").agg(
            F.sum("n").cast("long").alias("event_count"),
            F.count("user_id").alias("unique_users"),
            total_value.alias("total_value"),
        )
    )


# --------------------------------------------------------------------------- #
# A6 — inventory_movement_summary (silver_to_gold.py:175-186); multi-key agg
# --------------------------------------------------------------------------- #

_A6_ORACLE = f"""
SELECT
  strftime(l_shipdate, '%Y-%m-%d') AS date,
  l_returnflag,
  l_linestatus,
  {oracle_dec_sum("l_quantity", "total_quantity")},
  {oracle_dec_sum("l_extendedprice", "total_cost")},
  COUNT(l_orderkey) AS movement_count
FROM lineitem
GROUP BY strftime(l_shipdate, '%Y-%m-%d'), l_returnflag, l_linestatus
"""


@register("inventory_movement_summary", oracle=_A6_ORACLE, tags=("gold",))
def inventory_movement_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 analog: quantity/cost/count over a compound grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    return _finish_date(
        li.select(
            _day("l_shipdate"),
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_orderkey",
        )
        .groupBy("date", "l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "total_quantity"),
            dec_sum("l_extendedprice", "total_cost"),
            F.count("l_orderkey").alias("movement_count"),
        )
    )


# --------------------------------------------------------------------------- #
# A7 — inventory_net_position (silver_to_gold.py:189-207): pivot + derived col
# --------------------------------------------------------------------------- #

def _a7_oracle() -> str:
    cols = ",\n  ".join(
        "CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS {t}".format(t=t)
        for t in EVENTS_EVENT_TYPES
    )
    return f"""
SELECT
  strftime(ts, '%Y-%m-%d') AS date,
  {cols},
  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
    - CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
    AS net_position
FROM events
GROUP BY strftime(ts, '%Y-%m-%d')
"""


@register("event_net_position", oracle=_a7_oracle(), tags=("bench", "gold", "pivot"))
def event_net_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: pivot on an enum column with explicit value list, fill-0, and a
    derived net column (purchase − error, mirroring inbound − outbound)."""
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.select(
            _day("ts"),
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
        )
        .groupBy("date")
        # Explicit value list (not inferred) — mirrors silver_to_gold.py:200-202
        # and, at scale, avoids the extra distinct-values job Spark runs when
        # pivot values are not supplied.
        .pivot("event_type", list(EVENTS_EVENT_TYPES))
        .agg(F.sum("value_dec"))
    )
    for t in EVENTS_EVENT_TYPES:
        pivoted = pivoted.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("double"))
    return _finish_date(
        pivoted.withColumn("net_position", F.col("purchase") - F.col("error"))
    )


# --------------------------------------------------------------------------- #
# Silver validation kernel (bronze_to_silver.py:88-128) over `events`:
# null checks in declared order, then enum membership, then a range rule,
# accumulating the reference's exact "MSG; " error-string format (F7-F9).
# --------------------------------------------------------------------------- #

_VALID_TYPES_SQL = "('click', 'view', 'purchase', 'signup')"
_SILVER_ORACLE = f"""
SELECT
  event_id,
  TRIM(
    CONCAT(
      CASE WHEN event_id IS NULL THEN 'NULL:event_id; ' ELSE '' END,
      CASE WHEN ts IS NULL THEN 'NULL:ts; ' ELSE '' END,
      CASE WHEN user_id IS NULL THEN 'NULL:user_id; ' ELSE '' END,
      CASE WHEN event_type IS NULL THEN 'NULL:event_type; ' ELSE '' END,
      CASE WHEN event_type IS NOT NULL AND event_type NOT IN {_VALID_TYPES_SQL}
           THEN 'INVALID_EVENT_TYPE; ' ELSE '' END,
      CASE WHEN value IS NOT NULL AND value <= 0 THEN 'NON_POSITIVE_VALUE; ' ELSE '' END
    )
  ) AS validation_errors,
  TRIM(
    CONCAT(
      CASE WHEN event_id IS NULL THEN 'NULL:event_id; ' ELSE '' END,
      CASE WHEN ts IS NULL THEN 'NULL:ts; ' ELSE '' END,
      CASE WHEN user_id IS NULL THEN 'NULL:user_id; ' ELSE '' END,
      CASE WHEN event_type IS NULL THEN 'NULL:event_type; ' ELSE '' END,
      CASE WHEN event_type IS NOT NULL AND event_type NOT IN {_VALID_TYPES_SQL}
           THEN 'INVALID_EVENT_TYPE; ' ELSE '' END,
      CASE WHEN value IS NOT NULL AND value <= 0 THEN 'NON_POSITIVE_VALUE; ' ELSE '' END
    )
  ) = '' AS is_valid
FROM events
"""


@register("silver_validate_events", oracle=_SILVER_ORACLE, tags=("silver",))
def silver_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Silver validation semantics: ordered null checks, enum
    membership, range rule; error strings byte-compatible with the
    ``"MSG; "``-accumulate-then-strip format of bronze_to_silver.py:59-77."""
    events = load_table(spark, sf_dir, "events")
    pieces = [
        F.when(F.col("event_id").isNull(), F.lit("NULL:event_id; ")).otherwise(""),
        F.when(F.col("ts").isNull(), F.lit("NULL:ts; ")).otherwise(""),
        F.when(F.col("user_id").isNull(), F.lit("NULL:user_id; ")).otherwise(""),
        F.when(F.col("event_type").isNull(), F.lit("NULL:event_type; ")).otherwise(""),
        F.when(
            F.col("event_type").isNotNull()
            & ~F.col("event_type").isin("click", "view", "purchase", "signup"),
            F.lit("INVALID_EVENT_TYPE; "),
        ).otherwise(""),
        F.when(
            F.col("value").isNotNull() & (F.col("value") <= 0),
            F.lit("NON_POSITIVE_VALUE; "),
        ).otherwise(""),
    ]
    errors = F.trim(F.concat(*pieces))
    return events.select(
        "event_id",
        errors.alias("validation_errors"),
        (errors == "").alias("is_valid"),
    )


# --------------------------------------------------------------------------- #
# Unpivot — melt the A7 pivot back to long form (pivot⁻¹ round trip).
# --------------------------------------------------------------------------- #

def _unpivot_oracle() -> str:
    vals = ", ".join(f"('{t}')" for t in EVENTS_EVENT_TYPES)
    return f"""
WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date FROM events),
t(event_type) AS (VALUES {vals}),
agg AS (
  SELECT strftime(ts, '%Y-%m-%d') AS date, event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT d.date, t.event_type, COALESCE(agg.total_value, 0) AS total_value
FROM d CROSS JOIN t
LEFT JOIN agg ON agg.date = d.date AND agg.event_type = t.event_type
"""


@register("event_value_long", oracle=_unpivot_oracle(), tags=("gold", "pivot"))
def event_value_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot: the wide per-type value matrix melted back to
    (date, event_type, total_value) rows via DataFrame.unpivot — missing
    combinations survive as explicit zeros (the pivot's fill-0 contract).
    The oracle rebuilds the dense long form with a date×type cross join."""
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.select(
            _day("ts"),
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
        )
        .groupBy("date")
        .pivot("event_type", list(EVENTS_EVENT_TYPES))
        .agg(F.sum("value_dec"))
    )
    for t in EVENTS_EVENT_TYPES:
        pivoted = pivoted.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("double"))
    return _finish_date(pivoted).unpivot(
        ids=["date"],
        values=list(EVENTS_EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="total_value",
    )
