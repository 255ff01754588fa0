"""Join / window / top-k / set-op analytics over the TPC-H-ish testdata.

The reference implements no joins at all (SURVEY.md §2.7 declare-absent list);
these queries are the north-star extension surface the driver's oracle workload
is shaped for. Each is written Spark-first:

* small dims (``region``, ``nation``) are broadcast explicitly — at 100 TB the
  fact side is thousands of partitions and a shuffle of the dim is pure waste;
* fact⋈fact joins (orders⋈lineitem) shuffle on the join key and rely on AQE
  for skew splitting;
* filters are applied before joins so Catalyst pushes them into the parquet
  scan (verified via .explain — PushedFilters on o_orderdate etc.);
* money arithmetic follows the decimal-exact discipline in functions/money.py,
  with derived products (price×(1−disc)) rounded through DECIMAL(18,4) so the
  Spark and DuckDB sides sum identical exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import (
    dec_avg,
    dec_sum,
    oracle_dec_avg,
    oracle_dec_sum,
    scaled_long_sum,
)
from ..sources.readers import load_table
from .registry import register

# disc_price is an exact 4-decimal fixed-point value (2-dp price × 2-dp
# multiplier); the double product is within ~1e-12 of it, so summing through
# money.scaled_long_sum(·, 4) recovers exactly what the oracle's DECIMAL(18,4)
# cast sums. charge adds a 2-dp tax multiplier → 6 decimals.
# (Built lazily — Column construction needs an active SparkSession.)
def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _charge() -> F.Column:
    return (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )


_DISC_PRICE_SQL = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"
_CHARGE_SQL = "CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))"


# --------------------------------------------------------------------------- #
# TPC-H Q1 — pricing summary. The canonical scan→filter→agg benchmark query.
# --------------------------------------------------------------------------- #

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dec_sum("l_quantity", "sum_qty")},
  {oracle_dec_sum("l_extendedprice", "sum_base_price")},
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({_CHARGE_SQL}) AS DOUBLE) AS sum_charge,
  {oracle_dec_avg("l_quantity", "avg_qty")},
  {oracle_dec_avg("l_extendedprice", "avg_price")},
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_Q1_ORACLE, tags=("bench", "tpch"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide aggregate over filtered lineitem; the filter pushes to
    the parquet scan and the aggregate is a single shuffle with partials."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base_price"),
        scaled_long_sum(_disc_price(), 4).alias("sum_disc_price"),
        scaled_long_sum(_charge(), 6).alias("sum_charge"),
        dec_avg("l_quantity", "avg_qty"),
        dec_avg("l_extendedprice", "avg_price"),
        dec_avg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------- #
# TPC-H Q3 flavor — segment revenue per customer (3-way join, fact⋈fact).
# --------------------------------------------------------------------------- #

_Q3_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  COUNT(DISTINCT o.o_orderkey) AS order_count
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_custkey, c.c_name
"""


@register("customer_segment_revenue", oracle=_Q3_ORACLE, tags=("bench", "tpch", "join"))
def customer_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 flavor: customer⋈orders⋈lineitem with a selective dim filter.

    The segment filter cuts customer to ~20%; no broadcast hint on it —
    customer is fact-scaled in TPC-H, and a forced hint would override
    autoBroadcastJoinThreshold/AQE and OOM the driver at 100× scale. AQE
    still picks a broadcast join whenever the filtered side fits the
    threshold (it does at bench scale); the orders⋈lineitem join shuffles
    on the order key either way.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _disc_price().alias("disc_price")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            scaled_long_sum(F.col("disc_price"), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q5 flavor — revenue rollup through the full dim chain.
# --------------------------------------------------------------------------- #

_Q5_ORACLE = f"""
SELECT
  r.r_name,
  n.n_name,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  COUNT(*) AS lineitem_count
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
"""


@register("region_nation_revenue", oracle=_Q5_ORACLE, tags=("bench", "tpch", "join"))
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 flavor: 5-table star join. region/nation carry broadcast hints
    (true bounded dims); the customer-bearing dim chain does NOT — customer
    is fact-scaled, so the hint is left to AQE + autoBroadcastJoinThreshold,
    which still broadcasts it at bench scale but degrades gracefully to a
    shuffle join at 100× instead of OOMing the driver. lineitem⋈orders
    shuffles once on the order key."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _disc_price().alias("disc_price")
    )
    dims = (
        F.broadcast(region)
        .join(F.broadcast(nation), nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .select("r_name", "n_name", "c_custkey")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            scaled_long_sum(F.col("disc_price"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
    )


# --------------------------------------------------------------------------- #
# Window function — top-N orders per customer (deterministic tie-break).
# --------------------------------------------------------------------------- #

_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, order_rank
FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS order_rank
  FROM orders
)
WHERE order_rank <= 3
"""


@register("customer_top_orders", oracle=_WINDOW_ORACLE, tags=("bench", "window"))
def customer_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per customer via row_number window; tie-broken on
    the key so the result is deterministic across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("order_rank"),
        )
        .filter(F.col("order_rank") <= 3)
    )


# --------------------------------------------------------------------------- #
# Global top-k with deterministic ordering.
# --------------------------------------------------------------------------- #

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("top_orders", oracle=_TOPK_ORACLE, tags=("topk",))
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 orders. Spark plans this as TakeOrderedAndProject —
    per-partition heaps + single merge, no full sort, no full shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------- #
# Anti join — customers with no orders in a window.
# --------------------------------------------------------------------------- #

_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
"""


@register("inactive_customers", oracle=_ANTI_ORACLE, tags=("join",))
def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no 2001 orders. The date-filtered
    orders keyset is small at bench scale — but it grows with order volume,
    so the broadcast decision is AQE's, not a hint (broadcast anti join
    today, shuffle anti join when the window outgrows the threshold)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")


# --------------------------------------------------------------------------- #
# Semi join + dim rollup — active customers per nation.
# --------------------------------------------------------------------------- #

_SEMI_ORACLE = """
SELECT n.n_name, COUNT(*) AS active_customers
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
GROUP BY n.n_name
"""


@register("active_customers_by_nation", oracle=_SEMI_ORACLE, tags=("join",))
def active_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + broadcast dim join + count rollup."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    active = cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
    return (
        active.join(F.broadcast(nation), active.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


# --------------------------------------------------------------------------- #
# Ratio aggregate — discount share per return flag (exact-double division).
# --------------------------------------------------------------------------- #

_RATIO_ORACLE = f"""
SELECT
  l_returnflag,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS discounted_share,
  {oracle_dec_sum("l_extendedprice", "gross_revenue")}
FROM lineitem
GROUP BY l_returnflag
"""


@register("discount_share", oracle=_RATIO_ORACLE, tags=("tpch",))
def discount_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of discounted to gross revenue per return flag; both operands are
    exact decimal sums so the double division is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            scaled_long_sum(_disc_price(), 4)
            / scaled_long_sum(F.col("l_extendedprice"), 2)
        ).alias("discounted_share"),
        dec_sum("l_extendedprice", "gross_revenue"),
    )


# --------------------------------------------------------------------------- #
# Supplier rollup through a fact⋈dim join.
# --------------------------------------------------------------------------- #

_SUPP_ORACLE = f"""
SELECT
  s.s_suppkey,
  s.s_name,
  COUNT(DISTINCT l.l_partkey) AS parts_supplied,
  {oracle_dec_sum("l.l_quantity", "total_quantity")},
  {oracle_dec_sum("l.l_extendedprice", "total_revenue")}
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
"""


@register("supplier_stats", oracle=_SUPP_ORACLE, tags=("join",))
def supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier rollup; supplier is tiny → broadcast, lineitem aggregates
    map-side first on l_suppkey."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.countDistinct("l_partkey").alias("parts_supplied"),
            dec_sum("l_quantity", "total_quantity"),
            dec_sum("l_extendedprice", "total_revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q13 flavor — customer order-count distribution via LEFT OUTER JOIN.
# --------------------------------------------------------------------------- #

_Q13_ORACLE = """
SELECT order_count, COUNT(*) AS customer_count
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY order_count
"""


@register("order_count_distribution", oracle=_Q13_ORACLE, tags=("bench", "tpch", "join"))
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer, customers with zero orders
    included via the outer join. Two-level aggregation: the first groups on
    the join key (map-side combinable after the shuffle the join already
    needs — no extra exchange), the second is a tiny rollup over the
    distinct-count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count(F.lit(1)).alias("customer_count")
    )


# --------------------------------------------------------------------------- #
# TPC-H Q18 flavor — large orders: join against a HAVING-filtered aggregate.
# --------------------------------------------------------------------------- #

_Q18_THRESHOLD = 250

_Q18_ORACLE = f"""
SELECT o.o_orderkey, o.o_orderdate, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(t.total_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_THRESHOLD}
) t ON o.o_orderkey = t.l_orderkey
"""


@register("large_orders", oracle=_Q18_ORACLE, tags=("bench", "tpch", "join"))
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose lineitems sum past a quantity threshold.
    The aggregate-then-filter side shrinks to a tiny key set BEFORE the join,
    so AQE demotes the orders join to broadcast at runtime — aggregation as a
    join-input reducer, the shape that matters when both inputs are facts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > _Q18_THRESHOLD)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q22 flavor — above-average balance, never ordered: scalar subquery +
# anti join.
# --------------------------------------------------------------------------- #

_Q22_CUTOFF = "2000-01-01 00:00:00"

_Q22_ORACLE = f"""
SELECT c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
  FROM customer WHERE c_acctbal > 0.0
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
)
"""


@register("rich_inactive_customers", oracle=_Q22_ORACLE, tags=("tpch", "join"))
def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and no
    recent orders (every customer in this testdata has SOME order, so the
    anti join is time-scoped to stay non-vacuous). The scalar average is
    computed once and injected as a literal predicate (one tiny job, then
    full pushdown into the scan); the NOT EXISTS is a left_anti join whose
    right side is date-filtered BEFORE the join — no correlated per-row
    subquery execution anywhere."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(dec_avg("c_acctbal", "a"))
        .first()["a"]
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"))
    )


# --------------------------------------------------------------------------- #
# Cheapest supplier per part — argmin via window over a fact⋈dim join (Q2's
# core shape on the tables available here).
# --------------------------------------------------------------------------- #

_ARGMIN_ORACLE = """
SELECT l_partkey, s_suppkey, s_name, CAST(min_price AS DOUBLE) AS min_price
FROM (
  SELECT l.l_partkey, s.s_suppkey, s.s_name,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)))
           OVER (PARTITION BY l.l_partkey) AS part_min,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS min_price,
         ROW_NUMBER() OVER (
           PARTITION BY l.l_partkey
           ORDER BY CAST(l.l_extendedprice AS DECIMAL(18,2)), s.s_suppkey
         ) AS rn
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
)
WHERE rn = 1
"""


@register("cheapest_supplier_per_part", oracle=_ARGMIN_ORACLE, tags=("tpch", "window"))
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin per group (TPC-H Q2's core): the supplier offering each part at
    the lowest price, ties broken by suppkey. One window over the joined fact
    — the shuffle partitions on l_partkey once and both the min and the
    row_number ride the same sort, no self-join back."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = li.join(supp, li.l_suppkey == supp.s_suppkey)
    w = Window.partitionBy("l_partkey").orderBy(F.col("price_dec"), F.col("s_suppkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            "s_suppkey",
            "s_name",
            F.col("price_dec").cast("double").alias("min_price"),
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q7 flavor — bilateral volume: one dim table joined in two roles.
# --------------------------------------------------------------------------- #

_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
"""


@register("bilateral_trade_volume", oracle=_Q7_ORACLE, tags=("tpch", "join"))
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: cross-nation shipping volume per year. The nation dim joins
    in TWO roles (supplier side and customer side) via independent aliases;
    nation/supplier carry broadcast hints, the fact-scaled customer side is
    left to AQE (broadcast at bench scale, safe at 100×), lineitem⋈orders is
    the one big shuffle. The cross-nation filter applies post-join on dim columns
    (a row-level predicate over two dim attributes can't push below the
    joins, but it costs nothing map-side)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        _disc_price().alias("disc_price"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(scaled_long_sum(F.col("disc_price"), 4).alias("volume"))
    )


# --------------------------------------------------------------------------- #
# Argmax via struct-max — single-pass latest-row-per-group, no window.
# --------------------------------------------------------------------------- #

_LATEST_ORACLE = """
SELECT o_custkey, o_orderdate AS latest_date, o_orderkey AS latest_orderkey
FROM (
  SELECT o_custkey, o_orderdate, o_orderkey,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
         ) AS rn
  FROM orders
)
WHERE rn = 1
"""


@register("latest_order_per_customer", oracle=_LATEST_ORACLE, tags=("sqlops", "topk"))
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer as MAX(struct(ts, key)) — one partial-
    aggregating hash aggregate instead of a window (no per-partition sort,
    map-side combine shrinks the shuffle to one row per group per task; the
    window form shuffles every row). Struct comparison is lexicographic, so
    the orderkey tiebreak makes the argmax deterministic; the oracle computes
    the same row with a window, proving the two forms agree."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "o_custkey",
            F.col("m.o_orderdate").alias("latest_date"),
            F.col("m.o_orderkey").alias("latest_orderkey"),
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q8 flavor — market-share ratio via conditional aggregation.
# --------------------------------------------------------------------------- #

_Q8_ORACLE = """
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
         n.n_name AS supp_nation,
         SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS v
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY EXTRACT(year FROM o.o_orderdate), n.n_name
)
SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_0' THEN v ELSE 0 END) AS DOUBLE)
         / CAST(SUM(v) AS DOUBLE) AS focal_share
FROM vol
GROUP BY order_year
"""


@register("nation_market_share", oracle=_Q8_ORACLE, tags=("tpch", "join"))
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's (NATION_0) share of yearly revenue — conditional
    aggregation as a ratio of two exact integer sums (both operands exact →
    the double division is engine-deterministic). Two-level aggregate: the
    per-(year, nation) rollup shrinks the join output before the tiny
    share computation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _disc_price().alias("disc_price")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("order_year")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    v = F.sum(F.round(F.col("disc_price") * 10000).cast("long")).alias("v")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("order_year", F.col("n_name").alias("supp_nation"))
        .agg(v)
    )
    return vol.groupBy("order_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_0", F.col("v")).otherwise(0)).cast("double")
            / F.sum("v").cast("double")
        ).alias("focal_share")
    )


# --------------------------------------------------------------------------- #
# Rolling window frame — 3-order moving average per customer.
# --------------------------------------------------------------------------- #

_ROLLING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE)
         / (100.0 * COUNT(*) OVER w) AS moving_avg_price
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
"""


@register("customer_order_moving_avg", oracle=_ROLLING_ORACLE, tags=("window",))
def customer_order_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-order average price per customer — a bounded ROWS frame
    (2 preceding .. current). The frame sum is exact integer cents and the
    divisor an exact count, so the emitted double is engine-deterministic;
    ordering ties break on the order key."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).over(w))
        ).alias("moving_avg_price"),
    )


# --------------------------------------------------------------------------- #
# lag/lead offsets — inter-order gap in days per customer.
# --------------------------------------------------------------------------- #

_GAPS_ORACLE = """
SELECT o_custkey, o_orderkey,
  date_diff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS days_since_prev,
  date_diff('day', CAST(o_orderdate AS DATE),
            CAST(LEAD(o_orderdate) OVER w AS DATE)) AS days_until_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("customer_order_gaps", oracle=_GAPS_ORACLE, tags=("window",))
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer — the lag/lead offset
    window shape (the one frame family the registry didn't yet exercise).
    Offsets need no frame buffer: Spark evaluates them in the same sorted
    pass as any other window over (custkey, orderdate, orderkey), so cost is
    one shuffle + per-partition sort, identical to the moving-average query.
    First/last orders yield NULL gaps on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.to_date("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(day, F.to_date(F.lag("o_orderdate").over(w)))
        .cast("long")
        .alias("days_since_prev"),
        F.datediff(F.to_date(F.lead("o_orderdate").over(w)), day)
        .cast("long")
        .alias("days_until_next"),
    )


# --------------------------------------------------------------------------- #
# Collection aggregation — distinct order years per customer as a sorted list.
# --------------------------------------------------------------------------- #

_YEARS_ORACLE = """
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT))), ',') AS order_years,
       COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) AS n_years
FROM orders
GROUP BY o_custkey
"""


@register("customer_order_years", oracle=_YEARS_ORACLE, tags=("sqlops",))
def customer_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation: each customer's distinct order years,
    sorted and joined to a string (array renderings differ between engines;
    the joined form hashes identically). At scale collect_set state is
    bounded by the value domain (#years), not the row count."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set(yr)), ",").alias("order_years"),
            F.countDistinct(yr).alias("n_years"),
        )
    )


# --------------------------------------------------------------------------- #
# TPC-H Q20 shape — double-nested semi-join with a correlated aggregate
# threshold (testdata has no partsupp, so availqty > ½·shipped becomes
# supplier-share-of-part > ½·part-total — same nesting, same decorrelation).
# --------------------------------------------------------------------------- #

_Q20_PART_PREFIX = "small%"
_Q20_YEAR_LO, _Q20_YEAR_HI = "1996-01-01", "1997-01-01"

_Q20_ORACLE = f"""
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l1.l_suppkey
  FROM lineitem l1
  WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PART_PREFIX}')
    AND l1.l_shipdate >= TIMESTAMP '{_Q20_YEAR_LO}'
    AND l1.l_shipdate <  TIMESTAMP '{_Q20_YEAR_HI}'
  GROUP BY l1.l_suppkey, l1.l_partkey
  HAVING 2 * SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) > (
    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '{_Q20_YEAR_LO}'
      AND l2.l_shipdate <  TIMESTAMP '{_Q20_YEAR_HI}'
  )
)
"""


@register("dominant_part_suppliers", oracle=_Q20_ORACLE, tags=("tpch", "join"))
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of a filtered
    part's 1996 volume (IN-subquery → grouped HAVING → correlated scalar
    subquery — cf. /root/reference has no joins at all; this is north-star
    extension surface).

    Decorrelation, Spark-first: the correlated per-part total does NOT rescan
    lineitem — it's a window SUM over the (supplier, part) aggregate, so the
    whole query is ONE scan of lineitem (filters + the part semi-join pushed
    to it), one shuffle on (suppkey, partkey), a partkey-local window, and two
    broadcast joins. The ×2 integer-decimal comparison avoids a 0.5 multiply
    so both engines compare exact fixed-point values. At 100 TB: part filter
    broadcast-semi-prunes the scan, the window reuses the aggregate's
    partitioning (partkey ⊂ (suppkey, partkey) needs one AQE-sized shuffle),
    and the final supplier join broadcasts a tiny qualified-key set."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q20_PART_PREFIX))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _Q20_YEAR_LO) & (F.col("l_shipdate") < _Q20_YEAR_HI)
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty")
    )
    part_total = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("part_qty", F.sum("supp_qty").over(part_total))
        .filter(F.lit(2) * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(
            dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# --------------------------------------------------------------------------- #
# TPC-H Q21 shape — EXISTS + NOT EXISTS self-joins ("suppliers who were the
# sole cause of a late order"), decorrelated into pure aggregates.
# --------------------------------------------------------------------------- #

_Q21_LATE_DAYS = 90

_Q21_ORACLE = f"""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN late l1 ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_suppkey, s.s_name
"""


@register("sole_blame_suppliers", oracle=_Q21_ORACLE, tags=("tpch", "join"))
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late multi-supplier
    order — the textbook EXISTS + NOT EXISTS correlated self-join pair.

    Decorrelated Spark-first into aggregates instead of semi/anti joins: per
    order, count distinct suppliers (all lineitems) and distinct LATE
    suppliers; an order with exactly one late supplier and ≥ 2 suppliers
    total charges that late supplier. Equivalent to the EXISTS pair on
    distinct (order, supplier) grain — "another supplier exists" ⇔
    n_suppliers > 1, "no other late supplier" ⇔ n_late_suppliers = 1 — and a
    strictly better plan at 100 TB: the self-joins become two orderkey-grain
    aggregations feeding one broadcast-sized join, no correlated re-probes of
    lineitem, and AQE sizes the tiny qualified set automatically."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _Q21_LATE_DAYS))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late"),
        F.min("l_suppkey").alias("sole_suppkey"),  # well-defined when n_late = 1
    )
    supp_per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    blamed = (
        late_per_order.filter(F.col("n_late") == 1)
        .join(supp_per_order, "l_orderkey")
        .filter(F.col("n_supp") > 1)
        .groupBy("sole_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supplier.join(
        blamed, supplier.s_suppkey == blamed.sole_suppkey
    ).select("s_suppkey", "s_name", "numwait")


# --------------------------------------------------------------------------- #
# FULL OUTER join — per-nation extreme-balance customer vs supplier counts;
# thresholds chosen so BOTH unmatched sides are non-empty at sf0.01.
# --------------------------------------------------------------------------- #

_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey, COUNT(*) AS rich_customers
  FROM customer WHERE c_acctbal > 9950 GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey, COUNT(*) AS poor_suppliers
  FROM supplier WHERE s_acctbal < -400 GROUP BY s_nationkey
)
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       c.rich_customers,
       s.poor_suppliers
FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey
"""


@register("nation_balance_extremes", oracle=_OUTER_ORACLE, tags=("join",))
def nation_balance_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (the join type the
    registry otherwise lacks): nations having very-rich customers, very-poor
    suppliers, or either — unmatched sides surface as NULL counts (at sf0.01:
    6 customer-only + 3 supplier-only nations, so both null patterns are
    exercised, not vacuous). Aggregate-before-join shrinks each side to
    ≤ |nation| rows, so the outer join is broadcast-sized at any corpus
    scale; the filters push to the scans."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9950)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("rich_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < -400)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("poor_suppliers"))
    )
    return cust.join(
        supp, cust.c_nationkey == supp.s_nationkey, "full_outer"
    ).select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "rich_customers",
        "poor_suppliers",
    )


# --------------------------------------------------------------------------- #
# TPC-H Q17 flavor — correlated per-group average threshold.
# --------------------------------------------------------------------------- #

_Q17_ORACLE = """
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
  COUNT(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("small_quantity_revenue", oracle=_Q17_ORACLE, tags=("tpch", "join"))
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is under 20% of
    their part's average — a correlated aggregate threshold. Decorrelation:
    the brand filter makes ``part`` broadcast-small; a broadcast semi-join
    prunes lineitem to ~1/|brands| BEFORE the per-part average, which is then
    one window over the pruned rows (partkey determines brand, so pruning
    first loses no rows from any qualifying part's average — the correlated
    subquery and the window see identical groups). Total cost: one broadcast
    probe + one shuffle of the pruned fraction, vs the naive
    re-aggregate-per-outer-row. The 0.2·avg threshold is the identical IEEE
    double computation on both engines (integer-valued quantity sums)."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pruned = li.join(parts, li.l_partkey == parts.p_partkey)
    w = Window.partitionBy("l_partkey")
    small = pruned.withColumn("part_avg", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("part_avg")
    )
    return small.agg(
        (scaled_long_sum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# --------------------------------------------------------------------------- #
# TPC-H Q19 flavor — disjunctive multi-attribute join predicates.
# --------------------------------------------------------------------------- #

_Q19_ORACLE = f"""
SELECT
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
     (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1  AND 15 AND l.l_quantity BETWEEN 1  AND 11)
  OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 20)
  OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("promo_bracket_revenue", oracle=_Q19_ORACLE, tags=("tpch", "join"))
def promo_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three (brand, size-range, quantity-range)
    brackets across the join — the classic disjunctive-predicate planning
    test. Expressed as one equi-join plus the disjunction as a post-join
    filter: Catalyst keeps the hash join on p_partkey (part broadcasts) and
    derives the IMPLIED single-side ranges (l_quantity in [1,30], p_size in
    [1,50]) to push below the join, so the disjunction never degrades to a
    nested-loop join — the failure mode this query exists to catch."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _disc_price().alias("disc_price")
    )
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            scaled_long_sum(F.col("disc_price"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
