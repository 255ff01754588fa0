"""Second wave of TPC-H shapes (Q4/Q6/Q9/Q10/Q11/Q12/Q14/Q15/Q16 analogs).

The reference has no joins (SURVEY.md §2.7); these complete the classic
decision-support shapes the round-1/2 registry didn't yet cover — with this
module the registry covers an analog of every one of the 22 TPC-H queries:

* Q4  — EXISTS correlated semi-join counted by a dimension attribute;
* Q6  — single-table multi-predicate filter + aggregate (all pushed);
* Q9  — multi-join profit rollup (fact ⋈ fact ⋈ 2 dims) by nation × year;
* Q10 — returned-item revenue ranking (top-k over a 4-way join);
* Q11 — GROUP BY ... HAVING > (scalar subquery over the same fact);
* Q12 — two-way conditional CASE counts after a fact⋈fact join;
* Q14 — conditional-numerator ratio over a fact ⋈ broadcast-dim month;
* Q15 — argmax-by-scalar-subquery (revenue view joined to its own MAX);
* Q16 — COUNT(DISTINCT) with a NOT IN exclusion subquery.

The testdata schema has no partsupp / l_commitdate / l_receiptdate /
l_shipmode, so predicates are adapted (documented per query); the JOIN/
subquery/aggregation *shapes* — what the optimizer must handle — are intact.

Scale notes (local[32] now, 1000 executors later):

* semi/anti joins keep the fact side un-widened: a left_semi against a
  filtered lineitem never materializes lineitem columns downstream;
* scalar-subquery thresholds (Q11 total, Q15 max) are single-row broadcasts —
  cost is one extra pass over the aggregated (small) side, never the fact;
* all money sums go through functions/money.py scaled-long splits — exact,
  order-independent, primitive-codegen speed (see money.py envelope note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import scaled_long_sum
from ..sources.readers import load_table
from .registry import register


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_DISC_PRICE_SQL = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"


# --------------------------------------------------------------------------- #
# Q4 shape — EXISTS correlated semi-join, counted by order priority.
# Adapted predicate: "has a returned lineitem" (no l_commitdate/l_receiptdate
# in the testdata; TPC-H Q4's late-delivery EXISTS becomes a returnflag one).
# --------------------------------------------------------------------------- #

_Q4_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@register("priority_order_counts", oracle=_Q4_ORACLE, tags=("tpch", "join", "semi"))
def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarter of orders that have ≥1 returned lineitem,
    counted by priority. The EXISTS decorrelates to a left_semi join: the
    lineitem side is filtered (pushed to the scan) and projected to the join
    key alone before shuffling, and the semi join never duplicates an order
    row no matter how many lineitems match — exactly EXISTS semantics."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------- #
# Q9 shape — product-line profit by nation × order year.
# Adapted: no partsupp, so supply cost is modeled as 0.5 × p_retailprice per
# unit; the part filter keys on p_name tokens like TPC-H's '%green%'.
# --------------------------------------------------------------------------- #

# profit per row: a 4-dp-exact fixed-point value (disc_price is 4-dp; the
# 0.5·retailprice·quantity term is 3-dp: 2-dp price × integer qty × 0.5).
_Q9_AMOUNT_SQL = (
    "CAST(l_extendedprice * (1.0 - l_discount)"
    " - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4))"
)

_Q9_ORACLE = f"""
SELECT
  n.n_name AS nation,
  EXTRACT(year FROM o.o_orderdate) AS o_year,
  CAST(SUM({_Q9_AMOUNT_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
"""


@register("nation_product_profit", oracle=_Q9_ORACLE, tags=("tpch", "join"))
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way join rolled up to nation × year. Join order is
    declared smallest-first so Catalyst broadcasts part/supplier/nation (each
    ≤ p_partkey-cardinality, tiny next to lineitem); the only shuffling joins
    are fact⋈fact (lineitem⋈orders on orderkey) and the final 50-group agg.
    The p_name LIKE filter prunes part BEFORE its broadcast, which in turn
    prunes most of lineitem at the join — the same order a cost-based
    optimizer picks for Q9."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _disc_price() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(scaled_long_sum(amount, 4).alias("sum_profit"))
    )


# --------------------------------------------------------------------------- #
# Q10 shape — returned-item revenue: which customers returned the most, with
# their nation. Top 20 with a deterministic key tiebreak.
# --------------------------------------------------------------------------- #

_Q10_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  c.c_acctbal,
  n.n_name AS nation
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_item_customers", oracle=_Q10_ORACLE, tags=("tpch", "join", "topk"))
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20. Both
    filters (order date, returnflag) are pushed to their scans before the
    fact⋈fact join; nation carries a broadcast hint (bounded dim) while the
    fact-scaled customer side is left to AQE + autoBroadcastJoinThreshold
    (still broadcast at bench scale, shuffle-join at 100× instead of an OOM).
    The LIMIT after ORDER BY
    is a TakeOrderedAndProject — each task keeps 20 rows, the driver merges
    heaps, no global sort materializes. Ties broken by c_custkey so the top-20
    cut is deterministic across engines (exact decimal revenue makes the
    primary order reproducible too)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(scaled_long_sum(_disc_price(), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# Q11 shape — GROUP BY ... HAVING sum > fraction × (scalar subquery of the
# same sum over everything). Adapted: "important stock" becomes nation-level
# revenue share (no partsupp), threshold 1/25 of global revenue.
# --------------------------------------------------------------------------- #

_Q11_ORACLE = f"""
WITH nv AS (
  SELECT n.n_name AS nation, CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name
)
SELECT nation, value
FROM nv
WHERE value > (SELECT SUM(value) / 25.0 FROM nv)
"""


@register("major_supply_nations", oracle=_Q11_ORACLE, tags=("tpch", "join", "subquery"))
def major_supply_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: nations whose supplied revenue exceeds 1/25 of the
    global total. The fact is aggregated ONCE (25 result rows); the HAVING
    threshold is a scalar over those 25 rows computed via a single-row
    broadcast cross join — no second pass over lineitem, and the exact
    decimal sums make the > comparison engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nv = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(scaled_long_sum(_disc_price(), 4).alias("value"))
    )
    threshold = nv.agg((F.sum("value") / F.lit(25.0)).alias("threshold"))
    return (
        nv.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("nation", "value")
    )


# --------------------------------------------------------------------------- #
# Q12 shape — conditional two-way counts after a fact⋈fact join. Adapted:
# l_shipmode doesn't exist, so the "mode" dimension is l_returnflag and the
# critical/non-critical split keys on o_orderpriority (as in real Q12).
# --------------------------------------------------------------------------- #

_Q12_ORACLE = """
SELECT
  l.l_returnflag,
  -- CAST: DuckDB types SUM(int) as HUGEINT, which the driver's pandas bridge
  -- stringifies as float ("2223.0" vs Spark's bigint "2223").
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@register("priority_shipment_counts", oracle=_Q12_ORACLE, tags=("tpch", "join"))
def priority_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per returnflag, how many lineitems belong to
    high- vs low-priority orders. The shipdate filter pushes to the lineitem
    scan; both sides project to 2 columns before the orderkey shuffle; the
    CASE counts are map-side partial sums into 3 groups."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------- #
# Q15 shape — revenue "view" joined against its own MAX (argmax with ties).
# --------------------------------------------------------------------------- #

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("top_revenue_supplier", oracle=_Q15_ORACLE, tags=("tpch", "subquery"))
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    maximum. The revenue view is computed once (|suppliers| rows ≪ fact);
    its MAX is a 1-row broadcast; equality on the exact decimal sum keeps
    ties and the winner identical across engines. supplier broadcasts onto
    the tiny filtered result — the lineitem scan (filter pushed) is the only
    big input and it is read exactly once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        scaled_long_sum(_disc_price(), 4).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(sup, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------- #
# Q16 shape — COUNT(DISTINCT supplier) per part attribute, with a NOT IN
# exclusion subquery. Adapted: part⋈supplier pairs come from lineitem (no
# partsupp), and the excluded set is suppliers in deficit (s_acctbal < 0) —
# standing in for Q16's complaint-comment filter.
# --------------------------------------------------------------------------- #

_Q16_ORACLE = """
SELECT
  p.p_brand,
  p.p_type,
  p.p_size,
  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#11'
  AND p.p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("part_supplier_diversity", oracle=_Q16_ORACLE, tags=("tpch", "join", "anti"))
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size),
    excluding deficit suppliers via NOT IN → left_anti join. The exclusion
    list is tiny and broadcast (anti join adds no shuffle); part filters
    (brand, size-set) prune before its broadcast; the only shuffle is the
    final distinct-count agg. NOT IN's null trap doesn't apply — s_suppkey
    is a non-null key — so anti join is exactly equivalent."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deficit = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(deficit, li.l_suppkey == deficit.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------- #
# Q6 shape — single-table forecasting-revenue filter + aggregate. No join at
# all: the point of the shape is that EVERY predicate reaches the parquet
# scan (shipdate range, discount band, quantity cap all appear in
# PushedFilters) and the aggregation is a partial-final sum with no shuffle
# wider than one row per partition.
# --------------------------------------------------------------------------- #

_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_change", oracle=_Q6_ORACLE, tags=("tpch",))
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from dropping discounts in a band for a
    year. All four predicates push to the scan (conjunctive range filters on
    plain columns — `tools/explain_all.py` shows pushed=4-component filter and
    a 3-column ReadSchema), the double comparisons are literal-vs-stored-double
    on both engines (identical IEEE results), and the revenue sum is the
    4-dp scaled-long split (price 2dp × discount 2dp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        scaled_long_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------- #
# Q14 shape — promo-revenue share for one month: fact ⋈ broadcast dim, then a
# conditional-numerator / total-denominator ratio in one aggregate pass.
# Adapted: testdata p_type is a single token ('PROMO', 'ECONOMY', ...), so
# TPC-H's ``p_type LIKE 'PROMO%'`` becomes equality.
# --------------------------------------------------------------------------- #

_Q14_ORACLE = f"""
SELECT
  100.0 * (
    CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE)
  ) AS promo_revenue_pct,
  COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@register("promo_revenue_share", oracle=_Q14_ORACLE, tags=("tpch", "join"))
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of one month's revenue from promo parts. The month
    filter pushes to the lineitem scan; part broadcasts (map-side hash join, no
    fact shuffle); numerator and denominator are both exact 4-dp scaled-long
    sums computed in the SAME single aggregation pass, so the whole query is
    one scan + one 1-row reduce. The ratio is parenthesized identically on
    both engines — 100.0 * (num / den) — because double arithmetic is
    left-associative and (100·a)/b ≠ 100·(a/b) in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * (scaled_long_sum(promo, 4) / scaled_long_sum(disc, 4))
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
