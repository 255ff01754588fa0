"""SQL-surface operators: rollup/cube/grouping sets, set operations,
deterministic sampling, exact quantiles — plus the engine's Spark SQL entry
point (temp views + ``spark.sql``).

Declared absent in the reference (SURVEY.md §2.7); part of the complete-engine
surface. Money columns follow the functions/money.py exact-decimal discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec_sum, oracle_dec_sum
from ..sources.readers import load_table
from .registry import register

# --------------------------------------------------------------------------- #
# ROLLUP — subtotal hierarchy over (returnflag, linestatus).
# --------------------------------------------------------------------------- #

_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dec_sum("l_extendedprice", "revenue")},
  COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_pricing", oracle=_ROLLUP_ORACLE, tags=("sqlops",))
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal + grand-total rows (NULL group markers)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dec_sum("l_extendedprice", "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# CUBE — all grouping combinations of (orderstatus, orderpriority).
# --------------------------------------------------------------------------- #

_CUBE_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  {oracle_dec_sum("o_totalprice", "revenue")},
  COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_order_status", oracle=_CUBE_ORACLE, tags=("sqlops",))
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        dec_sum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------- #
# GROUPING SETS via the Spark SQL surface (temp views + spark.sql).
# --------------------------------------------------------------------------- #

_GSETS_SQL_BODY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dec_sum("l_extendedprice", "revenue")}
FROM {{table}}
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register(
    "grouping_sets_pricing",
    oracle=_GSETS_SQL_BODY.format(table="lineitem"),
    tags=("sqlops", "sql"),
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS issued through the engine's SQL surface: the same ANSI
    text runs on spark.sql (temp view) and on the DuckDB oracle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gsets")
    return spark.sql(_GSETS_SQL_BODY.format(table="li_gsets"))


# --------------------------------------------------------------------------- #
# Set operations: INTERSECT / EXCEPT.
# --------------------------------------------------------------------------- #

_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


@register("building_active_intersect", oracle=_INTERSECT_ORACLE, tags=("sqlops", "setop"))
def building_active_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets (distinct semantics)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    active = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.intersect(active)


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


@register("building_inactive_except", oracle=_EXCEPT_ORACLE, tags=("sqlops", "setop"))
def building_inactive_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — the complement of the intersect above."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    active = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(active).distinct()


# --------------------------------------------------------------------------- #
# Deterministic hash sampling — reproducible across engines and runs.
# --------------------------------------------------------------------------- #

_SAMPLE_ORACLE = f"""
SELECT
  o_orderstatus,
  COUNT(*) AS sampled_orders,
  {oracle_dec_sum("o_totalprice", "sampled_revenue")}
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
GROUP BY o_orderstatus
"""


@register("hash_sampled_orders", oracle=_SAMPLE_ORACLE, tags=("sqlops", "sampling"))
def hash_sampled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~12.5% deterministic sample via md5 prefix of the key — unlike
    ``df.sample``, identical membership on every engine/run, so downstream
    metrics are reproducible and oracle-checkable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("sampled_orders"),
            dec_sum("o_totalprice", "sampled_revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# Exact quantiles (interpolated) per group.
# --------------------------------------------------------------------------- #

_QUANTILE_ORACLE = """
SELECT
  o_orderstatus,
  quantile_cont(o_totalprice, 0.5) AS p50_price,
  quantile_cont(o_totalprice, 0.9) AS p90_price
FROM orders
GROUP BY o_orderstatus
"""


@register("order_price_quantiles", oracle=_QUANTILE_ORACLE, tags=("sqlops",))
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles (linear interpolation) — Spark
    ``percentile`` vs DuckDB ``quantile_cont`` on identical value sets."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50_price"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
    )


# --------------------------------------------------------------------------- #
# Approximate distinct — sketch-based, hash-certified via an INVARIANT oracle:
# HLL implementations differ across engines by design, so the raw estimate is
# not replayable in DuckDB; instead the output carries the exact count plus a
# boolean asserting the estimate landed within the accuracy contract, both of
# which the oracle reproduces. (The fully-replayable register-level HLL lives
# in ``hll_weekly_users_md5``.)
# --------------------------------------------------------------------------- #

_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_within_2pct
FROM events GROUP BY event_type
"""


@register(
    "approx_distinct_users",
    oracle=_APPROX_DISTINCT_ORACLE,
    tags=("sqlops", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type (rsd 1%), gated
    by an exact-bounds invariant: ``approx_within_2pct`` asserts
    |estimate − exact| ≤ 2% · exact, compared in INTEGER arithmetic
    (|Δ|·50 ≤ exact — no float surface). The oracle recomputes the exact
    count and expects TRUE, so a hash match certifies both the exact path
    and that the sketch honored its accuracy contract. The bound is not a
    coin flip: HLL++ is deterministic given the data, and the measured max
    relative error on the gate corpora is 0.67% (sf0.01) / 0.47% (sf0.1) —
    the 2% gate has ~3× headroom while still catching a broken sketch."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.01)
                - F.count_distinct("user_id")
            )
            * 50
            <= F.count_distinct("user_id")
        ).alias("approx_within_2pct"),
    )


# --------------------------------------------------------------------------- #
# JSON column functions — typed extraction from the events.props JSON string.
# --------------------------------------------------------------------------- #

_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(k) AS n_with_k,
  MIN(k) AS min_k,
  MAX(k) AS max_k,
  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
  COUNT(*) FILTER (WHERE k > 50) AS n_high
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
GROUP BY event_type
"""


@register("json_props_stats", oracle=_JSON_ORACLE, tags=("sqlops", "json"))
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing (``from_json`` — vectorized Jackson parse,
    no per-row Python) with typed aggregation over the extracted field. The
    avg is an exact integer-sum / count division, engine-deterministic."""
    from pyspark.sql.types import LongType, StructField, StructType

    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json("props", StructType([StructField("k", LongType())]))["k"].alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
    )


# --------------------------------------------------------------------------- #
# VARIANT semi-structured type — parse once, extract typed paths.
# --------------------------------------------------------------------------- #

_VARIANT_ORACLE = """
SELECT
  event_type,
  COUNT(k) AS n_k,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  COUNT(*) FILTER (WHERE k % 2 = 0) AS n_even_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
GROUP BY event_type
"""


@register("variant_props_stats", oracle=_VARIANT_ORACLE, tags=("sqlops", "json"))
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: ``try_parse_json``
    builds the binary variant once (malformed input degrades to NULL instead
    of failing the task — the PERMISSIVE discipline), ``variant_get`` extracts
    a typed path without re-parsing the string per field. Unlike the
    ``from_json`` twin (``json_props_stats``) the parse is schema-less, so the
    same scan serves any later path extraction — the right trade at 100 TB
    where the props schema drifts over time. Aggregates stay integer-exact."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") % 2 == 0, 1)).alias("n_even_k"),
        )
    )


# --------------------------------------------------------------------------- #
# Statistical aggregates — exact Pearson correlation from integer moments.
# --------------------------------------------------------------------------- #

# Built-in corr()/stddev() stream doubles in partition order → last-ulp drift
# between engines. Instead every moment is an exact scaled-long sum (price has
# 2 decimals, quantity is integral; their product has 2), and the correlation
# is derived from those identical exact values with identical double
# arithmetic on both sides — deterministic at any parallelism.

_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sx,
    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_quantity) AS BIGINT) AS DECIMAL(38,0))) AS sxx,
    SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS syy,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS qty_price_corr
FROM m
"""


@register("qty_price_correlation", oracle=_CORR_ORACLE, tags=("sqlops", "stats"))
def qty_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag, computed
    from exact integer moments (order-independent, unlike F.corr)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        # second moments overflow BIGINT at scale (price-cents² ~1e14 per
        # row); DECIMAL(38,0) sums are exact to 38 digits on both engines.
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")) * F.sqrt(
        nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select("l_returnflag", "n", (num / den).alias("qty_price_corr"))


# --------------------------------------------------------------------------- #
# SQL-text surface + correlated subquery decorrelation.
# --------------------------------------------------------------------------- #

# ONE SQL string, TWO engines: Spark runs it via spark.sql over a temp view,
# DuckDB runs it as the oracle verbatim. The correlated scalar subquery
# ("orders 1.5x above their customer's average") is decorrelated by Catalyst
# into an aggregate + join — no per-row subquery execution (.explain shows a
# plain Aggregate⋈Join, which is what survives at 100 TB). The comparison is
# pure integer arithmetic (cents × counts), so both engines evaluate the
# predicate exactly.
_ABOVE_AVG_SQL = """
SELECT o.o_orderkey,
       o.o_custkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 2
      > (SELECT SUM(CAST(ROUND(o3.o_totalprice * 100) AS BIGINT))
         FROM orders o3 WHERE o3.o_custkey = o.o_custkey) * 3
"""


@register("above_avg_orders", oracle=_ABOVE_AVG_SQL, tags=("sqlops", "sql"))
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced >1.5x their customer's average — the same SQL text the
    DuckDB oracle runs, executed through spark.sql over a temp view."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ABOVE_AVG_SQL)


# --------------------------------------------------------------------------- #
# Stratified deterministic sampling — per-stratum rates (the sampleBy shape,
# made engine-reproducible via key hashing instead of RNG).
# --------------------------------------------------------------------------- #

# Keep-rate sixteenths per order status: completed-ish strata downsampled
# harder than the rare ones — the usual imbalanced-training-data move.
_STRATA_RATES = {"O": 2, "F": 4, "P": 8}

_STRATified_ORACLE = f"""
SELECT
  o_orderstatus,
  COUNT(*) AS sampled_orders,
  {oracle_dec_sum("o_totalprice", "sampled_revenue")}
FROM orders
WHERE CASE o_orderstatus
        WHEN 'O' THEN 2 WHEN 'F' THEN 4 WHEN 'P' THEN 8 ELSE 0 END
      > CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) AS INT)
GROUP BY o_orderstatus
"""


@register("stratified_sampled_orders", oracle=_STRATified_ORACLE, tags=("sqlops", "sampling"))
def stratified_sampled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics): each
    status keeps its own fraction (2/16, 4/16, 8/16), membership decided by
    an md5 nibble of the key — identical sample on every engine/run, unlike
    RNG-based ``DataFrame.sampleBy``. At 100 TB this is a map-only scan
    filter; no shuffle is added by the sampling itself."""
    orders = load_table(spark, sf_dir, "orders")
    nibble = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1), 16, 10).cast("int")
    rate = (
        F.when(F.col("o_orderstatus") == "O", F.lit(2))
        .when(F.col("o_orderstatus") == "F", F.lit(4))
        .when(F.col("o_orderstatus") == "P", F.lit(8))
        .otherwise(F.lit(0))
    )
    return (
        orders.filter(rate > nibble)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("sampled_orders"),
            dec_sum("o_totalprice", "sampled_revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# Rank-family window functions — percent_rank / cume_dist / ntile.
# --------------------------------------------------------------------------- #

_RANKS_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@register("order_price_ranks", oracle=_RANKS_ORACLE, tags=("window",))
def order_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window trio per status stratum. The ORDER BY includes
    the unique key so ntile's row order (and thus the whole result) is
    engine-deterministic; percent_rank/cume_dist are value-determined but the
    tie-break costs nothing and future-proofs the hash check.

    Scale note: a window partitioned by a 3-value key sorts each stratum in
    ONE task — inherent to exact global ranks, fine at gate scale, a
    deliberate non-goal at 100 TB. There the right tool is the approximate
    rank: percentile_approx bucket edges per stratum (one pass, mergeable
    sketches) joined back as a bucket id — `order_price_quantiles` is that
    building block."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --------------------------------------------------------------------------- #
# Sketch-based approximate ranks — the 100 TB answer to order_price_ranks.
# --------------------------------------------------------------------------- #

_RANK_BUCKETS_ORACLE = """
WITH binned AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(FLOOR(o_totalprice / 5000) AS BIGINT) AS price_bucket
  FROM orders
), hist AS (
  SELECT o_orderstatus, price_bucket, COUNT(*) AS c
  FROM binned GROUP BY o_orderstatus, price_bucket
), cum AS (
  SELECT o_orderstatus, price_bucket,
         COALESCE(SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY price_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
         SUM(c) OVER (PARTITION BY o_orderstatus) AS n
  FROM hist
)
SELECT b.o_orderkey, b.o_orderstatus, b.price_bucket,
       CASE WHEN c.n > 1 THEN CAST(c.below AS DOUBLE) / (c.n - 1)
            ELSE 0.0 END AS approx_pct_rank
FROM binned b JOIN cum c USING (o_orderstatus, price_bucket)
"""


@register(
    "order_price_rank_buckets",
    oracle=_RANK_BUCKETS_ORACLE,
    tags=("window", "sketch", "approx"),
)
def order_price_rank_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percent_rank via histogram bucket edges joined back — the
    scale path for `order_price_ranks`, whose exact form sorts each status
    stratum in one task (a straggler at 100 TB with a hot stratum).

    Shape: (1) map-side bucket assignment (floor(price/width), no shuffle);
    (2) ONE small aggregation to a per-(stratum, bucket) histogram — the only
    shuffle, and it moves #strata × #buckets rows, not data rows; (3) a window
    over that tiny histogram table to get the cumulative count below each
    bucket; (4) broadcast the edges back onto the fact — a map-side join, so
    the data rows never shuffle and never sort. approx_pct_rank is the
    percent_rank every row in the bucket would share if ties collapsed to
    bucket granularity: error ≤ the heaviest bucket's mass fraction
    (tolerance-tested against the exact entry in tests). Unlike a GK/KLL
    sketch this histogram is deterministic, so the result is engine-exact and
    hash-oracled. Fixed-width buckets are the right sketch when the value
    range is known; the bucket table stays mergeable and tiny either way."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") / 5000).cast("long").alias("price_bucket"),
    )
    hist = binned.groupBy("o_orderstatus", "price_bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_below = (
        Window.partitionBy("o_orderstatus")
        .orderBy("price_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("o_orderstatus")
    edges = hist.select(
        "o_orderstatus",
        "price_bucket",
        F.coalesce(F.sum("c").over(w_below), F.lit(0)).alias("below"),
        F.sum("c").over(w_all).alias("n"),
    )
    return binned.join(
        F.broadcast(edges), ["o_orderstatus", "price_bucket"]
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "price_bucket",
        F.when(
            F.col("n") > 1, F.col("below").cast("double") / (F.col("n") - 1)
        )
        .otherwise(F.lit(0.0))
        .alias("approx_pct_rank"),
    )


# --------------------------------------------------------------------------- #
# RANGE frame over event time — trailing 30-day order count per customer.
# --------------------------------------------------------------------------- #

_TRAILING_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS orders_30d
FROM orders
"""


@register("orders_trailing_30d", oracle=_TRAILING_ORACLE, tags=("window", "temporal"))
def orders_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event time (not row position): for each order,
    how many orders its customer placed in the trailing 30 days, current row
    inclusive. Value-based frames are position-independent, so ties need no
    break and the result is engine-deterministic. Spark expresses day-valued
    RANGE bounds as a rangeBetween over the date's epoch-day integer."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    )
