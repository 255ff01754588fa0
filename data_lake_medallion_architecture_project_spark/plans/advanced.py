"""Advanced extension queries: skew-salted joins, time-series gap-filling,
unpivot/melt, and near-duplicate cluster assignment.

All extension surface beyond the reference (SURVEY.md §2.7): the reference's
pandas pipeline has no joins, no calendar densification, no melt, and stops
near-dup work at pair lists. Each query here is oracled against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import oracle_dec_sum, scaled_long_sum
from ..operators.components import connected_components, integer_pagerank
from ..operators.skew import salted_join
from ..sources.readers import load_table
from .registry import register

# --------------------------------------------------------------------------- #
# Salted join — plan-time skew neutralization, verified against the plain join.
# --------------------------------------------------------------------------- #

_SALTED_ORACLE = f"""
SELECT
  c.c_mktsegment,
  COUNT(*) AS n_orders,
  {oracle_dec_sum("o_totalprice", "revenue", 2)}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("salted_segment_revenue", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer through ``salted_join`` (operators/skew.py): the fact
    side carries a salt hashed from its row id, the dim side is exploded
    ×salts, and the join key becomes (custkey, salt) — a pathologically hot
    customer spreads over 8 shuffle partitions instead of melting one
    executor. The oracle is the PLAIN join: salting must not change results,
    and this query proves it with a value-hash match. (AQE skew splitting
    covers runtime-detected skew; salting is the plan-time defense for skew
    you know about — see the operator docstring.)"""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(orders, cust, "o_custkey", "c_custkey", salt_cols=["o_orderkey"], salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            scaled_long_sum(F.col("o_totalprice"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# Time-series gap-filling — calendar densification via sequence + explode.
# --------------------------------------------------------------------------- #

_GAPFILL_ORACLE = """
WITH b AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
),
c AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1
)
SELECT strftime(cal.day, '%Y-%m-%d') AS day, COALESCE(c.n, 0) AS n_orders
FROM cal LEFT JOIN c ON cal.day = c.d
"""


@register("daily_orders_gapfilled", oracle=_GAPFILL_ORACLE, tags=("temporal",))
def daily_orders_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts with zero-filled calendar gaps — the densification
    step every downstream time-series model (forecasting, anomaly detection)
    needs, and a shape plain GROUP BY cannot produce (absent days have no
    rows to group). The calendar is built from a 1-row min/max aggregate via
    ``sequence``+``explode`` — bounded by elapsed days, never by data volume —
    and the day-grain counts (also calendar-bounded after their map-side-
    combined aggregation) broadcast into the left join, so the plan carries
    exactly one fact-table shuffle regardless of scale."""
    days = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    counts = days.groupBy("d").agg(F.count(F.lit(1)).alias("n_orders"))
    cal = (
        days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return cal.join(F.broadcast(counts), cal["day"] == counts["d"], "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


# --------------------------------------------------------------------------- #
# Unpivot / melt — wide measures to long (metric, value) rows.
# --------------------------------------------------------------------------- #

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, metric, value FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem WHERE l_orderkey % 25 = 0)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME metric VALUE value
)
"""


@register("lineitem_metric_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape",))
def lineitem_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the four lineitem measures into (metric, value) long form —
    the inverse of A7's pivot and the standard reshape feeding per-metric
    profiling/quality dashboards. ``DataFrame.unpivot`` plans as a single
    Expand (×4 row growth, zero shuffles, pipelined into the scan) — at any
    scale this is a map-only pass whose only cost is the inherent output
    multiplicity. Values pass through untouched (no arithmetic), so the
    cross-engine hash matches bit-exactly on raw doubles. The deterministic
    ``% 25`` key filter (pushed to the scan) keeps gate output bounded."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 25 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        )
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------- #
# Near-duplicate clusters — connected components over the similarity graph.
# --------------------------------------------------------------------------- #

_CLUSTERS_CTE = """
WITH RECURSIVE
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                                      i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / len(list_distinct(a.sh || b.sh)) >= 0.8
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(a, comp) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.a
),
cl AS (
  SELECT d.doc_id, d.n_chars, COALESCE(m.comp, d.doc_id) AS cluster_id
  FROM documents d
  LEFT JOIN (SELECT a, MIN(comp) AS comp FROM reach GROUP BY a) m ON d.doc_id = m.a
)
"""

_CLUSTERS_ORACLE = _CLUSTERS_CTE + """
SELECT doc_id, cluster_id FROM cl
"""


@register("near_dup_clusters", oracle=_CLUSTERS_ORACLE, tags=("dedup", "text"))
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document labeled with its near-duplicate CLUSTER id — the step
    that turns pair lists into a dedup policy ("keep the smallest doc_id per
    cluster", a trivial filter on this output). Edges are the exact shingle-
    Jaccard ≥ 0.8 pairs (prefix-filtered join, operators/dedup.py); cluster
    ids come from min-label-propagation connected components
    (operators/components.py — iterative join+min, O(diameter) rounds);
    singletons re-attach by broadcast left join, cluster_id = own id. The
    oracle recomputes the same components as a DuckDB recursive CTE
    (transitive closure), so the min-id-per-component contract is verified
    across engines. Scale: edges from LSH are near-linear in corpus size and
    near-dup cliques have tiny diameter — see the operator docstring."""
    from ..operators.dedup import shingle_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=3)
    comp = connected_components(pairs, "id_a", "id_b")
    return docs.select("doc_id").join(
        comp, docs["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        F.coalesce("comp", "doc_id").cast("long").alias("cluster_id"),
    )


# --------------------------------------------------------------------------- #
# Equal-width histogram — exact integer bucketing (no float boundary wobble).
# --------------------------------------------------------------------------- #

_HISTOGRAM_ORACLE = """
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
b AS (SELECT MIN(cents) AS lo, MAX(cents) - MIN(cents) + 1 AS span FROM c)
SELECT
  CAST((cents - lo) * 20 // span AS BIGINT) AS bucket,
  COUNT(*) AS n_orders,
  CAST(MIN(cents) AS DOUBLE) / 100 AS min_price,
  CAST(MAX(cents) AS DOUBLE) / 100 AS max_price
FROM c, b
GROUP BY 1
"""


@register("order_price_histogram", oracle=_HISTOGRAM_ORACLE, tags=("sqlops",))
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equal-width price histogram with EXACT bucket edges: prices are
    scaled to integer cents (exact for <=2-decimal inputs, the money.py
    precondition), and the bucket id is pure integer arithmetic
    ((cents-lo)*20 div span) — identical in every engine, where the textbook
    float formula floor((x-lo)/width) disagrees across engines for values
    sitting on a boundary. The global (lo, span) pair comes from a 1-row
    aggregate cross-joined back (broadcast, same shape as the gap-fill
    calendar); the histogram itself is one map-side-combined aggregation over
    20 keys. Per-bucket min/max report in dollars via exact integer /100."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = load_table(spark, sf_dir, "orders").select(cents.alias("cents"))
    b = c.agg(
        F.min("cents").alias("lo"),
        (F.max("cents") - F.min("cents") + 1).alias("span"),
    )
    return (
        c.crossJoin(F.broadcast(b))
        .select(
            F.expr("(cents - lo) * 20 div span").alias("bucket"), F.col("cents")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("cents").cast("double") / 100).alias("min_price"),
            (F.max("cents").cast("double") / 100).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------- #
# Column profiling — per-column null/distinct census in one pass.
# --------------------------------------------------------------------------- #

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col, COUNT(*) - COUNT({c}) AS n_null,"
    f" COUNT(DISTINCT {c}) AS n_distinct FROM orders"
    for c in _PROFILE_COLS
)


@register("orders_column_profile", oracle=_PROFILE_ORACLE, tags=("quality",))
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven column census — (column, n_null, n_distinct) for every
    orders column, the profiling pass a data catalog runs on ingest. One
    aggregation computes all 12 metrics (Spark plans the multi-distinct via
    a single Expand — one shuffle, not 6 scans), then a 1-row explode melts
    the result long. At 100 TB the same shape swaps COUNT(DISTINCT) for
    approx_count_distinct to drop the Expand; the quality suite
    (operators/quality.py) consumes either form."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    one = orders.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select(
        "p.col", "p.n_null", "p.n_distinct"
    )


# --------------------------------------------------------------------------- #
# Bloom-filter semi-join reduction — replayable runtime-filter bits.
# --------------------------------------------------------------------------- #

_BLOOM_SEGMENT = "AUTOMOBILE"

_BLOOM_ORACLE = f"""
WITH ks AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
),
bloom AS (
  SELECT DISTINCT j.j,
         substr(md5(CAST(j.j AS VARCHAR) || '|' || CAST(c_custkey AS VARCHAR)), 1, 4) AS pos
  FROM ks, (SELECT unnest([0, 1, 2]) AS j) j
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey,
         COUNT(*) AS hits
  FROM orders o, (SELECT unnest([0, 1, 2]) AS j) j
  JOIN bloom b
    ON b.j = j.j
   AND b.pos = substr(md5(CAST(j.j AS VARCHAR) || '|' || CAST(o.o_custkey AS VARCHAR)), 1, 4)
  GROUP BY o.o_orderkey, o.o_custkey
),
cand AS (SELECT o_orderkey, o_custkey FROM probe WHERE hits = 3)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  CAST(COUNT(CASE WHEN k.c_custkey IS NOT NULL THEN 1 END) AS BIGINT) AS n_true_matches,
  CAST(COUNT(CASE WHEN k.c_custkey IS NULL THEN 1 END) AS BIGINT) AS n_false_positives
FROM cand
LEFT JOIN ks k ON cand.o_custkey = k.c_custkey
"""


@register("bloom_prefilter_orders", oracle=_BLOOM_ORACLE, tags=("bench", "join", "sketch"))
def bloom_prefilter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction with REPLAYABLE bits
    (operators/bloom.py): build a 3-row md5-prefix Bloom filter over the
    {segment} customers, probe every order map-side through three chained
    broadcast left-semi joins (no exchange before the filter), and report
    the funnel — total orders, Bloom candidates, true matches, false
    positives. Zero false negatives by construction; at the gate scales the
    fp sliver is the fill^k expectation.

    Why it matters at 100 TB: this is the EXPLICIT form of Spark's runtime
    bloom filters — the shuffle after the prefilter carries candidates
    instead of the whole fact table, and the filter itself is
    keyset-bounded 4-char strings (broadcastable when the raw dim is not).
    The DuckDB oracle rebuilds the identical filter from the same md5
    prefixes, so candidate selection — including which false positives
    survive — is hash-certified cross-engine."""
    from ..operators.bloom import BLOOM_K, bloom_build, bloom_mark

    customer = load_table(spark, sf_dir, "customer")
    keys = customer.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select(
        "c_custkey"
    )
    bloom = bloom_build(keys, "c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Marker form (not the semi-join bloom_probe): keeps every order row so
    # the whole funnel — total, candidates, true/false positives — falls out
    # of ONE aggregate over ONE scan, with no driver-side count() action.
    marked = bloom_mark(orders, "o_custkey", bloom, out_col="_hits")
    truth = keys.select(F.col("c_custkey").alias("o_custkey")).withColumn(
        "_in", F.lit(True)
    )
    passed = F.col("_hits") == BLOOM_K
    return (
        marked.join(F.broadcast(truth), "o_custkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(passed, 1)).alias("n_candidates"),
            F.count(F.when(passed & F.col("_in"), 1)).alias("n_true_matches"),
            F.count(F.when(passed & F.col("_in").isNull(), 1)).alias(
                "n_false_positives"
            ),
        )
        .select("n_orders", "n_candidates", "n_true_matches", "n_false_positives")
    )


# --------------------------------------------------------------------------- #
# Integer PageRank over the part co-purchase graph — iterative algorithm,
# exactly replayable cross-engine because every step stays in integers.
# --------------------------------------------------------------------------- #

PR_SCALE = 1_000_000   # rank unit: micro-ranks (pr0 = 1.0)
PR_ITERS = 3           # fixed, unrolled in both engines
PR_DAMP = 85           # damping 0.85 as an integer percentage
PR_BASE = (100 - PR_DAMP) * PR_SCALE // 100
PR_TOP = 20


def _pagerank_oracle() -> str:
    prev = "pr0"
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""pr{i} AS (
  SELECT d.src, CAST({PR_BASE} + ({PR_DAMP} * t.s) // 100 AS BIGINT) AS pr, d.deg
  FROM deg d JOIN (
    SELECT e.dst AS src, SUM(p.pr // p.deg) AS s
    FROM e JOIN {prev} p ON e.src = p.src GROUP BY e.dst
  ) t ON t.src = d.src
)"""
        )
        prev = f"pr{i}"
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
e AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
pr0 AS (SELECT src, CAST({PR_SCALE} AS BIGINT) AS pr, deg FROM deg),
{",".join(iters)}
SELECT src AS p_partkey, deg AS degree, pr AS pagerank_micro
FROM {prev} ORDER BY pr DESC, src LIMIT {PR_TOP}
"""


@register(
    "part_copurchase_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph (parts are
    adjacent when some order contains both) — the iterative-algorithm class
    (Page et al. 1999), made hash-gateable by keeping EVERY step in integer
    micro-ranks: contributions are pr DIV deg, the damping step is
    150000 + (85·Σ) DIV 100, so there is no float summation order to drift
    between engines; both sides truncate identically on non-negative values.
    Three fixed iterations are unrolled into the lazy plan (and the oracle's
    CTE chain) — convergence-to-epsilon is a driver loop in production, but
    the per-iteration plan shape is what this certifies.

    Scale shape: the graph builds from one equi self-join on l_orderkey
    (shuffle co-located on the key, pair fan-out bounded by order size, ≤13
    lines/order in TPC-H) and one DISTINCT; each iteration is one equi-join
    edges⋈ranks on src plus one groupBy(dst) SUM — linear shuffles on the
    edge table, the canonical distributed-PageRank step. At 100 TB the
    adjacency would be persisted/bucketed on src once instead of recomputed
    per unrolled branch; at bench scale ReuseExchange already dedupes the
    repeated subtree. No reference analog (its pipeline has no graph ops) —
    this extends the Gold layer the way product-affinity reporting needs."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pr = integer_pagerank(edges, PR_ITERS, PR_SCALE, PR_DAMP)
    return (
        pr.select(
            F.col("src").alias("p_partkey"),
            F.col("deg").alias("degree"),
            F.col("pr").alias("pagerank_micro"),
        )
        .orderBy(F.col("pagerank_micro").desc(), "p_partkey")
        .limit(PR_TOP)
    )


# --------------------------------------------------------------------------- #
# Skyline (Pareto frontier) — minimize price, maximize volume.
# --------------------------------------------------------------------------- #

_SKYLINE_ORACLE = """
WITH vol AS (
  SELECT l_partkey, SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS v
  FROM lineitem GROUP BY 1
),
pp AS (
  SELECT CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_c, vol.v,
         p.p_partkey
  FROM vol JOIN part p ON p.p_partkey = vol.l_partkey
),
points AS (
  SELECT price_c, v, COUNT(*) AS n_parts, MIN(p_partkey) AS min_partkey
  FROM pp GROUP BY 1, 2
),
w AS (
  SELECT *, MAX(v) OVER (
    ORDER BY price_c ASC, v DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ) AS runmax
  FROM points
)
SELECT price_c AS retail_price_cents, CAST(v AS BIGINT) AS total_qty_c100,
       n_parts, min_partkey
FROM w WHERE runmax IS NULL OR v > runmax
"""
# CAST(v AS BIGINT): DuckDB SUM(BIGINT) is HUGEINT → pandas float64 → driver
# hash mismatch vs Spark int64 (round-9 root cause; tests/test_oracle_types.py).


def _frontier_filter(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One sorted-scan skyline pass for (minimize price_c, maximize v):
    within each window partition, a point survives iff its v strictly
    exceeds every v at strictly-better-or-equal price seen before it —
    the classic sort-filter skyline (Börzsönyi et al., ICDE'01) as a
    running MAX over (price asc, v desc) with a strict comparison. Rows
    are distinct (price_c, v) points, so the order is total and the
    frame deterministic."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("price_c").asc(), F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runmax = F.max("v").over(w)
    return df.withColumn("_rm", runmax).where(
        F.col("_rm").isNull() | (F.col("v") > F.col("_rm"))
    ).drop("_rm")


@register(
    "part_price_volume_skyline",
    oracle=_SKYLINE_ORACLE,
    tags=("bench", "analytics", "skyline"),
)
def part_price_volume_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of SOLD parts on (retail price LOW, total quantity
    sold HIGH): the "cheap parts that move the most volume" set no single
    ORDER BY can produce — a part is on the skyline iff no other sold part
    is at-most-as-expensive AND sells at-least-as-much with one strict.
    Comparisons run on exact integer grains (price cents, quantity
    centi-units under the fixed-point contract, functions/money.py), so
    both engines pick the identical frontier.

    Scale shape: the corpus-sized work is one groupBy(l_partkey) SUM and
    one equi-join to part; parts then collapse to distinct (price, volume)
    POINTS (carrying n_parts + an anchor key). The skyline itself is the
    distributed two-pass form: a salted LOCAL frontier pass first (a
    globally-undominated point is undominated in every subset, so the
    local pass only discards provably-dominated points), then the exact
    global pass over the surviving candidates — the final single-partition
    sort sees the local frontiers, not the point cloud. The oracle replays
    the single-pass definition directly; equality certifies the two-pass
    decomposition."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    vol = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("v")
    )
    pp = vol.join(part, vol.l_partkey == part.p_partkey).select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        "v",
        "p_partkey",
    )
    points = pp.groupBy("price_c", "v").agg(
        F.count(F.lit(1)).alias("n_parts"), F.min("p_partkey").alias("min_partkey")
    )
    local = _frontier_filter(
        points.withColumn("_salt", F.pmod(F.hash("price_c", "v"), F.lit(32))),
        ["_salt"],
    ).drop("_salt")
    return _frontier_filter(local, []).select(
        F.col("price_c").alias("retail_price_cents"),
        F.col("v").alias("total_qty_c100"),
        "n_parts",
        "min_partkey",
    )


# --------------------------------------------------------------------------- #
# Robust anomaly detection — median/MAD with ALL-integer decision rule.
# --------------------------------------------------------------------------- #

# Modified z-score flag: 0.6745·d/MAD > 3.5 (Iglewicz & Hoaglin 1993),
# cleared of floats by scaling both sides by 20000·MAD:
#   13490·d > 70000·MAD  ⇔  13490·d > 35000·mad2   (mad2 = 2·MAD)
_MAD_NUM, _MAD_THR = 13490, 35000

_ANOMALY_ORACLE = f"""
WITH x AS (
  SELECT o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
med AS (
  SELECT prio,
         SUM(CASE WHEN rn = (n + 1) // 2 THEN cents END)
           + SUM(CASE WHEN rn = n // 2 + 1 THEN cents END) AS med2
  FROM x GROUP BY prio
),
d AS (
  SELECT x.prio, x.cents, abs(2 * x.cents - m.med2) AS dev,
         row_number() OVER (PARTITION BY x.prio
                            ORDER BY abs(2 * x.cents - m.med2), x.cents) AS rn,
         COUNT(*) OVER (PARTITION BY x.prio) AS n
  FROM x JOIN med m ON x.prio = m.prio
),
mad AS (
  SELECT prio,
         SUM(CASE WHEN rn = (n + 1) // 2 THEN dev END)
           + SUM(CASE WHEN rn = n // 2 + 1 THEN dev END) AS mad2
  FROM d GROUP BY prio
)
SELECT d.prio, COUNT(*) AS n_orders,
       CAST(MAX(m.med2) AS BIGINT) AS med2_cents,
       CAST(MAX(m2.mad2) AS BIGINT) AS mad2_cents,
       COUNT(CASE WHEN {_MAD_NUM} * d.dev > {_MAD_THR} * m2.mad2 THEN 1 END)
         AS n_anomalies,
       COALESCE(MAX(CASE WHEN {_MAD_NUM} * d.dev > {_MAD_THR} * m2.mad2
                         THEN d.cents END), 0) AS max_anomaly_cents
FROM d JOIN med m ON d.prio = m.prio JOIN mad m2 ON d.prio = m2.prio
GROUP BY d.prio
"""


@register(
    "priority_order_anomalies",
    oracle=_ANOMALY_ORACLE,
    tags=("analytics", "quality"),
)
def priority_order_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order priority: modified z-score on
    median/MAD (Iglewicz & Hoaglin 1993) — the mean/stddev rule breaks on
    the very outliers it hunts; median and MAD have 50% breakdown. Made
    hash-gateable by keeping EVERYTHING integer: medians are carried
    doubled (med2 = the middle pair's sum, so even-n interpolation never
    leaves ℤ), deviations are |2·cents − med2|, and the 3.5-threshold test
    0.6745·d/MAD > 3.5 is cross-multiplied to 13490·d > 35000·mad2 — no
    division anywhere, so both engines flag the identical rows.

    Scale shape: two rank-median passes (window sort per group — the exact
    quantile's price; the DDSketch path is the sub-linear alternative when
    ±1% suffices) + one broadcast of the 5-row group stats; the decision
    itself is a map-side integer comparison."""
    from pyspark.sql import Window

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"), cents.alias("cents")
    )

    def _med2(df: DataFrame, val: str) -> DataFrame:
        w = Window.partitionBy("prio").orderBy(val, "cents")
        n = Window.partitionBy("prio")
        r = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(n)
        )
        lo = F.floor((F.col("_n") + 1) / 2)
        hi = F.floor(F.col("_n") / 2) + 1
        return r.groupBy("prio").agg(
            (
                F.sum(F.when(F.col("_rn") == lo, F.col(val)))
                + F.sum(F.when(F.col("_rn") == hi, F.col(val)))
            ).alias(f"{val}2")
        )

    med = _med2(x.withColumn("v", F.col("cents")), "v").withColumnRenamed(
        "v2", "med2"
    )
    d = x.join(F.broadcast(med), "prio").withColumn(
        "dev", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = _med2(d.withColumn("v", F.col("dev")), "v").withColumnRenamed(
        "v2", "mad2"
    )
    flag = F.lit(_MAD_NUM) * F.col("dev") > F.lit(_MAD_THR) * F.col("mad2")
    return (
        d.join(F.broadcast(mad), "prio")
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("med2").alias("med2_cents"),
            F.max("mad2").alias("mad2_cents"),
            F.count(F.when(flag, 1)).alias("n_anomalies"),
            F.coalesce(F.max(F.when(flag, F.col("cents"))), F.lit(0)).alias(
                "max_anomaly_cents"
            ),
        )
    )


# --------------------------------------------------------------------------- #
# Association rules — market-basket support/confidence/lift over orders.
# --------------------------------------------------------------------------- #

AR_TOP = 25

_ASSOC_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
ic AS (SELECT p, COUNT(*) AS c FROM li GROUP BY p),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_ab
  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2
),
top AS (
  SELECT part_a, part_b, n_ab FROM pairs
  ORDER BY n_ab DESC, part_a, part_b LIMIT {AR_TOP}
)
SELECT t.part_a, t.part_b,
       ca.c AS n_a, cb.c AS n_b, t.n_ab, n.n_orders,
       CAST(t.n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
       CAST(t.n_ab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf_a_to_b,
       CAST(t.n_ab AS DOUBLE) / CAST(cb.c AS DOUBLE) AS conf_b_to_a,
       (CAST(t.n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
         / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
FROM top t
JOIN ic ca ON ca.p = t.part_a
JOIN ic cb ON cb.p = t.part_b
CROSS JOIN n
"""


@register(
    "part_association_rules", oracle=_ASSOC_ORACLE, tags=("analytics", "graph")
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over orders (Agrawal & Srikant,
    VLDB'94 measures): the top-25 co-purchased part pairs with support,
    both directed confidences, and lift. Integer anchors (n_a, n_b, n_ab,
    n_orders) carry the gate; the measures are single-division (or one
    product + one division, identically parenthesized) IEEE ops from exact
    integers, so both engines emit identical doubles.

    Scale shape: baskets collapse to DISTINCT (order, part) once; pair
    counts come from the same bounded-fan-out equi self-join as the
    co-purchase graph (≤ lines² per order, ≤13 lines in TPC-H) with
    map-side partial counting; top-25 is TakeOrderedAndProject
    (per-partition top-N, no global sort); item counts attach to the
    25-row winner set by broadcast. The 1-row basket total is the
    whitelisted scalar-broadcast shape."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n = li.select(F.countDistinct("ok").alias("n_orders"))
    ic = li.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = li.select("ok", F.col("p").alias("part_a"))
    b = li.select("ok", F.col("p").alias("part_b"))
    top = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .orderBy(F.col("n_ab").desc(), "part_a", "part_b")
        .limit(AR_TOP)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        ic.select(F.col("p").alias("part_a"), F.col("c").alias("n_a"))
        .join(F.broadcast(top), "part_a")
        .join(
            ic.select(F.col("p").alias("part_b"), F.col("c").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_a",
            "n_b",
            "n_ab",
            "n_orders",
            (d("n_ab") / d("n_orders")).alias("support"),
            (d("n_ab") / d("n_a")).alias("conf_a_to_b"),
            (d("n_ab") / d("n_b")).alias("conf_b_to_a"),
            ((d("n_ab") * d("n_orders")) / (d("n_a") * d("n_b"))).alias("lift"),
        )
    )


# --------------------------------------------------------------------------- #
# Leakage-free split — train/val/test decided per near-dup CLUSTER.
# --------------------------------------------------------------------------- #

_LEAKAGE_SPLIT_ORACLE = _CLUSTERS_CTE + """
, asg AS (
  SELECT n_chars, cluster_id,
         CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM cl
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM asg GROUP BY split
"""


@register(
    "leakage_free_split_summary",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("sampling", "dedup"),
)
def leakage_free_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment decided per NEAR-DUP CLUSTER, not per
    document — the leakage-free split: `doc_split_summary`'s md5(doc_id)
    rule puts two near-identical documents in train and test with
    probability 2·p·(1−p), silently contaminating evaluation; hashing the
    CLUSTER id instead makes every member of a similarity component land in
    the same split by construction (Lee et al. 2022's deduplication-aware
    eval discipline). Same 80/10/10 md5 thresholds as the doc-level split,
    same byte determinism; clusters from the prefix-filtered exact-Jaccard
    graph + min-label components (`near_dup_clusters`' machinery), so the
    oracle replays clustering AND assignment. Scale: the cluster pass is
    the near-dup cost (LSH-bounded); the split itself is a map-only hash +
    3-group agg."""
    from ..operators.dedup import shingle_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=3)
    comp = connected_components(pairs, "id_a", "id_b")
    cl = docs.select("doc_id", "n_chars").join(
        comp, docs["doc_id"] == comp["id"], "left"
    ).select(
        "n_chars", F.coalesce("comp", "doc_id").cast("long").alias("cluster_id")
    )
    bucket = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    return (
        cl.select(
            "n_chars",
            "cluster_id",
            F.when(bucket < "cc", "train")
            .when(bucket < "e6", "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------- #
# Gini coefficient — revenue concentration, exact rank-weighted moments.
# --------------------------------------------------------------------------- #

_GINI_ORACLE = """
WITH cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT segment, cents,
         row_number() OVER (PARTITION BY segment ORDER BY cents, o_custkey) AS i
  FROM cust
),
m AS (
  SELECT segment, COUNT(*) AS n,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS ws
  FROM r GROUP BY segment
)
SELECT segment, n AS n_customers, CAST(s AS BIGINT) AS revenue_cents,
       (2.0 * CAST(ws AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM m
"""


@register("segment_revenue_gini", oracle=_GINI_ORACLE, tags=("analytics",))
def segment_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment as a Gini coefficient —
    the "do 1% of customers carry the segment?" inequality measure, via the
    rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted
    per-customer revenue. Exactness: revenues are integer cents, the
    rank-weighted moment Σ i·xᵢ accumulates as DECIMAL(38,0) (ties in the
    sort break on custkey, so ranks are a total order and the moment is
    engine-identical), and floats appear only in the final fixed-shape
    expression.

    Scale shape: one fact agg to (segment, customer) grain + the dim join;
    the rank is a per-segment window sort over CUSTOMERS (dim-sized, not
    fact-sized); moments collapse to G rows."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
        .join(cust, "o_custkey")
    )
    i = F.row_number().over(
        Window.partitionBy("segment").orderBy("cents", "o_custkey")
    )
    r = per_cust.select("segment", "cents", i.alias("i"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = r.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.sum("cents")).alias("s"),
        dec(F.sum(dec(F.col("i")) * F.col("cents"))).alias("ws"),
    )
    n_d, s_d = F.col("n").cast("double"), F.col("s").cast("double")
    return m.select(
        "segment",
        F.col("n").alias("n_customers"),
        F.col("s").cast("long").alias("revenue_cents"),
        (
            (F.lit(2.0) * F.col("ws").cast("double")) / (n_d * s_d)
            - (n_d + F.lit(1.0)) / n_d
        ).alias("gini"),
    )


# --------------------------------------------------------------------------- #
# A-priori frequent pairs — pruning proven lossless by the unpruned oracle.
# --------------------------------------------------------------------------- #

AP_MIN_SUPPORT = 2

_APRIORI_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem)
SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS support
FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
GROUP BY 1, 2
HAVING COUNT(*) >= {AP_MIN_SUPPORT}
"""


@register("part_pairs_apriori", oracle=_APRIORI_ORACLE, tags=("analytics", "graph"))
def part_pairs_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL part pairs with co-purchase support ≥ {AP_MIN_SUPPORT}, mined
    with A-priori pruning (Agrawal & Srikant, VLDB'94): a pair can only be
    frequent if BOTH items are (support(ab) ≤ min(support(a), support(b))),
    so baskets are first semi-joined to the frequent-item set and only the
    surviving rows pay the pair self-join — the downward-closure lemma that
    makes itemset mining feasible when most items are rare. The ORACLE
    deliberately mines UNPRUNED (raw self-join + HAVING): hash equality is
    a machine-checked proof that the pruning loses nothing, the same
    verify-the-optimization pattern as `salted_segment_revenue` (salted vs
    plain join) and the PPJoin prefix filter.

    Scale shape: item counts are one map-side-combinable agg; the semi-join
    shrinks the basket table BEFORE the quadratic-per-basket pair step and
    the pair-grain aggregate — on a Zipfian catalog (real stores) the
    frequent-item set is a tiny fraction, which is where the 45× pair-grain
    cost of the unpruned `part_association_rules` probe goes to die."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    freq = (
        li.groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= AP_MIN_SUPPORT)
        .select("p")
    )
    pruned = li.join(freq, "p", "left_semi")
    a = pruned.select("ok", F.col("p").alias("part_a"))
    b = pruned.select("ok", F.col("p").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= AP_MIN_SUPPORT)
    )


# --------------------------------------------------------------------------- #
# Mann–Whitney U — nonparametric two-sample test, fully integer via 2×ranks.
# --------------------------------------------------------------------------- #

_MWU_ORACLE = """
WITH x AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
g AS (
  SELECT v, COUNT(*) AS cnt, SUM(is_f) AS cnt_f FROM x GROUP BY v
),
r AS (
  SELECT v, cnt, cnt_f,
         COALESCE(SUM(cnt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS first_rank
  FROM g
),
m AS (
  SELECT CAST(SUM(cnt_f) AS BIGINT) AS n_f,
         CAST(SUM(cnt - cnt_f) AS BIGINT) AS n_o,
         CAST(SUM(cnt_f * (2 * first_rank + cnt - 1)) AS BIGINT) AS r2_f
  FROM r
)
SELECT n_f, n_o,
       CAST(r2_f - n_f * (n_f + 1) AS BIGINT) AS u2_f,
       CAST(r2_f - n_f * (n_f + 1) AS DOUBLE)
         / (2.0 * CAST(n_f AS DOUBLE) * CAST(n_o AS DOUBLE)) AS auc_f_gt_o
FROM m
"""


@register("status_price_ranksum", oracle=_MWU_ORACLE, tags=("analytics", "eval"))
def status_price_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U comparing order-price distributions between finished
    ('F') and open ('O') orders — the nonparametric "is one group
    stochastically larger?" test (and its effect size U/(n₁n₂), which IS
    the AUC of price as a classifier of status). Fully integer: ranks with
    tie-averaging are carried DOUBLED (average of a tied run = first+last,
    so 2·rank̄ = 2·first + cnt − 1 stays in ℤ), rank sums and U accumulate
    exactly, and the one float is the closing AUC division. Ties are
    handled at the VALUE grain (cents), so the rank walk is a window over
    distinct prices, not rows.

    Scale shape: one agg to distinct-value grain, one cumulative window
    over values (bounded by price cardinality, ~10⁵ cents grains), one
    1-row moment agg."""
    from pyspark.sql import Window

    x = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("F", "O"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
        )
    )
    g = x.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is_f").alias("cnt_f")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "cnt",
        "cnt_f",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("first_rank"),
    )
    m = r.agg(
        F.sum("cnt_f").alias("n_f"),
        F.sum(F.col("cnt") - F.col("cnt_f")).alias("n_o"),
        F.sum(
            F.col("cnt_f") * (2 * F.col("first_rank") + F.col("cnt") - 1)
        ).alias("r2_f"),
    )
    u2 = F.col("r2_f") - F.col("n_f") * (F.col("n_f") + 1)
    return m.select(
        "n_f",
        "n_o",
        u2.cast("long").alias("u2_f"),
        (
            u2.cast("double")
            / (F.lit(2.0) * F.col("n_f").cast("double") * F.col("n_o").cast("double"))
        ).alias("auc_f_gt_o"),
    )


# --------------------------------------------------------------------------- #
# Kolmogorov–Smirnov — max ECDF gap, exact via cross-multiplied integers.
# --------------------------------------------------------------------------- #

_KS_ORACLE = """
WITH x AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
g AS (
  SELECT v, SUM(is_f) AS cf, SUM(1 - is_f) AS co FROM x GROUP BY v
),
c AS (
  SELECT v,
         SUM(cf) OVER (ORDER BY v) AS cum_f,
         SUM(co) OVER (ORDER BY v) AS cum_o,
         SUM(cf) OVER () AS n_f,
         SUM(co) OVER () AS n_o
  FROM g
),
m AS (
  SELECT CAST(MAX(n_f) AS BIGINT) AS n_f, CAST(MAX(n_o) AS BIGINT) AS n_o,
         CAST(MAX(abs(cum_f * n_o - cum_o * n_f)) AS BIGINT) AS d_num
  FROM c
)
SELECT n_f, n_o, d_num,
       CAST(d_num AS DOUBLE) / (CAST(n_f AS DOUBLE) * CAST(n_o AS DOUBLE))
         AS ks_d
FROM m
"""


@register("status_price_ks", oracle=_KS_ORACLE, tags=("analytics", "eval"))
def status_price_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between finished and open
    orders' price distributions — the distribution-level companion to the
    rank-sum test (rank-sum sees location shifts; KS sees ANY ECDF gap,
    including shape/variance changes). The sup of |F̂₁ − F̂₂| is taken at
    value grain with CROSS-MULTIPLIED integers: D·n₁·n₂ =
    max |cum₁·n₂ − cum₂·n₁| needs no division inside the max, so the
    argmax is exact and engine-identical; the one float is the final
    normalization. ECDF steps only move at observed values, so evaluating
    at the distinct-cents grain IS the exact sup.

    Scale shape: one agg to distinct-value grain, one cumulative window
    over values, a 1-row max."""
    from pyspark.sql import Window

    x = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("F", "O"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
        )
    )
    g = x.groupBy("v").agg(
        F.sum("is_f").alias("cf"), F.sum(1 - F.col("is_f")).alias("co")
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = g.select(
        F.sum("cf").over(w_cum).alias("cum_f"),
        F.sum("co").over(w_cum).alias("cum_o"),
        F.sum("cf").over(w_all).alias("n_f"),
        F.sum("co").over(w_all).alias("n_o"),
    )
    m = c.agg(
        F.max("n_f").cast("long").alias("n_f"),
        F.max("n_o").cast("long").alias("n_o"),
        F.max(
            F.abs(F.col("cum_f") * F.col("n_o") - F.col("cum_o") * F.col("n_f"))
        )
        .cast("long")
        .alias("d_num"),
    )
    return m.select(
        "n_f",
        "n_o",
        "d_num",
        (
            F.col("d_num").cast("double")
            / (F.col("n_f").cast("double") * F.col("n_o").cast("double"))
        ).alias("ks_d"),
    )


# --------------------------------------------------------------------------- #
# Benford's-law deviation — leading-digit audit of the money column.
# --------------------------------------------------------------------------- #

import math as _math

_BENFORD_P = {d: repr(_math.log10(1 + 1 / d)) for d in range(1, 10)}


def _benford_oracle() -> str:
    e_case = "\n         ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
    )
    return f"""
WITH x AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, COUNT(*) AS n_observed FROM x GROUP BY digit),
m AS (
  SELECT digit, n_observed,
         SUM(n_observed) OVER () AS n,
         CASE digit
         {e_case}
         END AS p
  FROM c
),
t AS (
  SELECT digit, n_observed,
         CAST(n AS DOUBLE) * p AS expected,
         CAST((CAST(n_observed AS DOUBLE) - CAST(n AS DOUBLE) * p)
              * (CAST(n_observed AS DOUBLE) - CAST(n AS DOUBLE) * p)
              / (CAST(n AS DOUBLE) * p) AS DECIMAL(20,9)) AS term
  FROM m
)
SELECT digit, n_observed, expected,
       CAST(term AS DOUBLE) AS chi2_contrib,
       CAST(SUM(term) OVER () AS DOUBLE) AS chi2_total
FROM t
"""


@register("price_benford_deviation", oracle=_benford_oracle(), tags=("quality", "analytics"))
def price_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order amounts against Benford's law —
    the classic fabricated-numbers audit (naturally-grown amounts spanning
    orders of magnitude lead with 1 ~30% of the time; uniform or invented
    data doesn't). The leading digit comes from the CENTS integer's first
    decimal character (string head of an exact long — engine-identical, no
    float log10 floor), expectations use shared repr'd log10(1+1/d)
    literals, and the chi-square terms follow the quantize-then-exact-sum
    recipe. TPC-H prices are uniform on a bounded range, so the corpus
    legitimately FAILS Benford — the query reports deviation, it doesn't
    assume conformance.

    Scale shape: one map-only digit projection + a 9-group agg; everything
    after runs on 9 rows."""
    from pyspark.sql import Window

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    x = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"))
    )
    c = x.groupBy("digit").agg(F.count(F.lit(1)).alias("n_observed"))
    p = F.col("digit")
    p_expr = None
    for d, lit in _BENFORD_P.items():
        p_expr = (
            F.when(p == d, F.lit(float(lit)))
            if p_expr is None
            else p_expr.when(p == d, F.lit(float(lit)))
        )
    n = F.sum("n_observed").over(Window.partitionBy())
    m = c.select(
        "digit", "n_observed", n.alias("n"), p_expr.alias("p")
    )
    e = F.col("n").cast("double") * F.col("p")
    term = (
        (F.col("n_observed").cast("double") - e)
        * (F.col("n_observed").cast("double") - e)
        / e
    ).cast("decimal(20,9)")
    t = m.select("digit", "n_observed", e.alias("expected"), term.alias("term"))
    return t.select(
        "digit",
        "n_observed",
        "expected",
        F.col("term").cast("double").alias("chi2_contrib"),
        F.sum("term").over(Window.partitionBy()).cast("double").alias("chi2_total"),
    )


# --------------------------------------------------------------------------- #
# Winsorized mean — robust location with exact rank-based clamping.
# --------------------------------------------------------------------------- #

_WINSOR_ORACLE = """
WITH x AS (
  SELECT o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
b AS (
  SELECT prio,
         MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) AS lo,
         MAX(CASE WHEN rn = (n * 95) // 100 + 1 THEN v END) AS hi
  FROM x GROUP BY prio
),
w AS (
  SELECT x.prio, x.n,
         CAST(SUM(x.v) AS DECIMAL(38,0)) AS s_raw,
         CAST(SUM(LEAST(GREATEST(x.v, b.lo), b.hi)) AS DECIMAL(38,0)) AS s_win
  FROM x JOIN b ON b.prio = x.prio
  GROUP BY x.prio, x.n
)
SELECT prio, CAST(n AS BIGINT) AS n_orders,
       CAST(s_raw AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS raw_mean,
       CAST(s_win AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS winsorized_mean
FROM w
"""


@register("priority_winsorized_mean", oracle=_WINSOR_ORACLE, tags=("analytics", "quality"))
def priority_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95% winsorized mean of order value per priority beside the raw
    mean — the robust-location companion to the MAD flags: instead of
    dropping outliers it CLAMPS them to the exact 5th/95th rank values, so
    the estimate keeps every row's vote but caps leverage. Fences come
    from rank positions ⌈n/20⌉ and ⌊19n/20⌋+1 under a (value, orderkey)
    total order — exact integers, engine-identical; clamped sums
    accumulate as DECIMAL(38,0); floats only in the two final mean
    divisions.

    Scale shape: one window sort per priority (rows — the exact-quantile
    price, same budget as `priority_order_anomalies`; the DDSketch path is
    the sub-linear estimate) + a broadcast of the G-row fence table."""
    from pyspark.sql import Window

    w = Window.partitionBy("prio").orderBy("o_totalprice", "o_orderkey")
    n_w = Window.partitionBy("prio")
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        "o_totalprice",
        "o_orderkey",
    ).select(
        "prio",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    )
    lo_rn = F.floor((F.col("n") * 5 + 99) / 100)
    hi_rn = F.floor(F.col("n") * 95 / 100) + 1
    b = x.groupBy("prio").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("v"))).alias("hi"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = x.join(F.broadcast(b), "prio")
    m = joined.groupBy("prio", "n").agg(
        dec(F.sum("v")).alias("s_raw"),
        dec(
            F.sum(F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi")))
        ).alias("s_win"),
    )
    n_d = F.col("n").cast("double")
    return m.select(
        "prio",
        F.col("n").cast("long").alias("n_orders"),
        (F.col("s_raw").cast("double") / (n_d * F.lit(100.0))).alias("raw_mean"),
        (F.col("s_win").cast("double") / (n_d * F.lit(100.0))).alias(
            "winsorized_mean"
        ),
    )


# --------------------------------------------------------------------------- #
# Pareto 80/20 index — how few customers carry 80% of revenue.
# --------------------------------------------------------------------------- #

_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS i,
         SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cents) OVER () AS total,
         COUNT(*) OVER () AS n
  FROM cust
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN i END) AS BIGINT) AS k_for_80pct,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN i END) AS DOUBLE)
         / CAST(MAX(n) AS DOUBLE) AS top_share_for_80pct
FROM r
"""


@register("customer_revenue_pareto", oracle=_PARETO_ORACLE, tags=("analytics",))
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto 80/20 index: the smallest k such that the top-k customers
    by revenue carry ≥80% of total revenue, and k as a share of the
    customer base — the concentration headline ("17% of customers are 80%
    of revenue") that pairs with `segment_revenue_gini`'s coefficient. The
    threshold walk is exact integers (5·cum ≥ 4·total — no float
    boundary) over a total order (revenue desc, custkey), so both engines
    pick the identical k; the one float is the closing share division.

    Scale shape: one fact agg to customer grain, one ranked cumulative
    window over CUSTOMERS (dim-sized), a 1-row reduce."""
    from pyspark.sql import Window

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    order = Window.orderBy(F.col("cents").desc(), "o_custkey")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allw = Window.partitionBy()
    r = cust.select(
        F.row_number().over(order).alias("i"),
        F.sum("cents").over(cum).alias("cum"),
        F.sum("cents").over(allw).alias("total"),
        F.count(F.lit(1)).over(allw).alias("n"),
    )
    k = F.min(F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("i")))
    return r.agg(
        F.max("n").cast("long").alias("n_customers"),
        k.cast("long").alias("k_for_80pct"),
        (k.cast("double") / F.max("n").cast("double")).alias(
            "top_share_for_80pct"
        ),
    )
