"""Temporal analytics: as-of join, sessionization, time-window rollups.

The reference has no temporal operators beyond day truncation (SURVEY.md
§2.7); these are extension surface. Oracles use DuckDB's native ASOF JOIN and
window functions, so the custom Spark implementations are verified against an
independent engine's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import events_in_window_counts
from ..sources.readers import load_table
from .registry import register

# --------------------------------------------------------------------------- #
# As-of join: each purchase event ↔ the same user's most recent click ≤ ts.
# --------------------------------------------------------------------------- #

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("purchases_with_last_click", oracle=_ASOF_ORACLE, tags=("bench", "temporal"))
def purchases_with_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union-merge operator (operators/asof.py): one
    shuffle on user_id, running last-click carry-forward, no range join."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, key="user_id", ts="ts", out_col="last_click_ts")


# --------------------------------------------------------------------------- #
# Sessionization: 30-minute inactivity gap → session ids per user.
# --------------------------------------------------------------------------- #

_SESSION_ORACLE = """
WITH ordered AS (
  SELECT
    user_id, event_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT
  user_id,
  CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_no,
  event_id,
  ts
FROM ordered
"""


def with_session_no(events: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """Append a per-user ``session_no`` column (gap-based sessionization),
    preserving every input column. One shuffle on user_id shared by the lag
    and cumulative-sum window frames.

    timestamp_diff is wall-clock arithmetic valid for both TIMESTAMP and
    TIMESTAMP_NTZ (a bigint cast is rejected for NTZ inputs). Microsecond
    units keep the gap test exact — a SECOND diff truncates and misses
    sub-second boundary gaps, diverging from the interval comparison."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    new_session = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) > gap_us),
        1,
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("new_session", new_session).withColumn(
        "session_no", F.sum("new_session").over(running).cast("long")
    ).drop("new_session")


@register("sessionize_events", oracle=_SESSION_ORACLE, tags=("temporal", "window"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum windows, one shuffle on
    user_id shared by both window frames."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return with_session_no(events).select("user_id", "session_no", "event_id", "ts")


# --------------------------------------------------------------------------- #
# Tumbling-window rollup: hourly event stats (streaming-compatible shape).
# --------------------------------------------------------------------------- #

_HOURLY_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("hourly_event_windows", oracle=_HOURLY_ORACLE, tags=("temporal",))
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows via F.window — identical shape to a Structured
    Streaming windowed aggregation, here run in batch mode."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


# --------------------------------------------------------------------------- #
# Native session windows — F.session_window, the batch twin of the streaming
# sessionizer in streaming/windows.py.
# --------------------------------------------------------------------------- #

# Spark's session_window is a half-open interval [start, last+gap): an event
# exactly gap seconds after the previous one starts a NEW session, so the
# gaps-and-islands oracle must break on diff >= 1800 (not > 1800, which is
# the contract of the hand-rolled `sessionize_events` above).
_NATIVE_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS sno
  FROM ordered
)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
  COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sno
"""


@register("native_session_windows", oracle=_NATIVE_SESSION_ORACLE, tags=("bench", "temporal", "window"))
def native_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via the built-in ``F.session_window`` aggregation —
    one hash aggregate with window-merge, no lag/cumsum window pair; the same
    operator Structured Streaming uses for streaming session aggregation.
    The oracle recomputes sessions with gaps-and-islands SQL."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


# --------------------------------------------------------------------------- #
# Range join — clicks within one hour after each purchase, via the bucketed
# range-join operator (operators/rangejoin.py).
# --------------------------------------------------------------------------- #

_RANGE_ORACLE = """
SELECT p.event_id, COUNT(c.ts) AS n_in_window
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


@register("clicks_after_purchase", oracle=_RANGE_ORACLE, tags=("bench", "temporal", "join"))
def clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): per purchase, clicks in the next hour.
    A naive inequality join is a BroadcastNestedLoopJoin scanning |P|·|C|
    pairs; the bucketed operator quantizes to hour buckets, equi-joins on the
    bucket (probe side exploded to its ≤2 candidate buckets), and refines
    with the exact predicate — O(co-bucketed pairs) and hash-join
    parallelism. Exact integer-microsecond arithmetic on both engines."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    return events_in_window_counts(
        purchases, clicks, anchor_id="event_id", ts_col="ts"
    )


# --------------------------------------------------------------------------- #
# Hopping (sliding) windows — 1 h window every 30 min; each event lands in
# exactly two overlapping windows.
# --------------------------------------------------------------------------- #

_SLIDING_ORACLE = """
SELECT
  strftime(to_timestamp(ws), '%Y-%m-%d %H:%M') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM (
  SELECT e.*, f.ws
  FROM events e,
       LATERAL (SELECT UNNEST([
         CAST(floor(epoch(e.ts) / 1800) * 1800 AS BIGINT),
         CAST(floor(epoch(e.ts) / 1800) * 1800 - 1800 AS BIGINT)
       ]) AS ws) f
)
GROUP BY ws, event_type
"""


@register("sliding_event_windows", oracle=_SLIDING_ORACLE, tags=("temporal", "window"))
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows (1 h long, 30 min slide) via F.window's slideDuration —
    the overlap shape tumbling windows can't express (each event counted in
    its two covering windows). Spark expands the event to its covering
    windows before the aggregation exactly like the oracle's LATERAL unnest
    of the two 30-min-aligned start times; the shuffle then carries
    (window, event_type) keys — 2× the tumbling shuffle volume, the inherent
    cost of overlap, still map-side-combined."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


# --------------------------------------------------------------------------- #
# Event-type transition matrix — lag offset + rollup (funnel analysis).
# --------------------------------------------------------------------------- #

_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM s
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@register("event_type_transitions", oracle=_TRANSITIONS_ORACLE, tags=("temporal", "window"))
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive event types per user —
    the funnel-analysis shape: a lag offset over (user, time) and a rollup of
    the (prev, next) bigram. One shuffle on user_id for the window sort, then
    map-side partial aggregation into a domain-bounded (|types|²) result —
    the second shuffle carries at most |types|²·partitions rows regardless of
    event volume. Ordering ties break on event_id, so the transition stream
    is deterministic on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# --------------------------------------------------------------------------- #
# Session funnel: view → click → purchase progression per session.
# --------------------------------------------------------------------------- #

_FUNNEL_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, event_id, event_type, ts,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_no
  FROM ordered
),
w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id, session_no) AS v
  FROM s
),
w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= v THEN ts END)
              OVER (PARTITION BY user_id, session_no) AS c
  FROM w1
),
w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= c THEN ts END)
              OVER (PARTITION BY user_id, session_no) AS p
  FROM w2
),
per_session AS (
  SELECT user_id, session_no,
         CASE WHEN MAX(p) IS NOT NULL THEN 3
              WHEN MAX(c) IS NOT NULL THEN 2
              WHEN MAX(v) IS NOT NULL THEN 1
              ELSE 0 END AS funnel_stage
  FROM w3 GROUP BY user_id, session_no
)
SELECT CAST(funnel_stage AS BIGINT) AS funnel_stage,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM per_session GROUP BY funnel_stage
"""


@register("session_funnel_counts", oracle=_FUNNEL_ORACLE, tags=("temporal", "window"))
def session_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-progression funnel over gap-based sessions: how many sessions
    reached view (1), view→click (2), view→click→purchase (3), or none (0).
    Each stage's anchor is the earliest qualifying event AT OR AFTER the
    previous stage's anchor, so out-of-order arrivals don't count.

    One shuffle total: sessionization partitions by user_id, and every later
    window/groupBy clusters on (user_id, session_no) — a superset of the
    existing hash partitioning, so Catalyst inserts sorts, not exchanges;
    only the final 4-row stage rollup exchanges again."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    sess = Window.partitionBy("user_id", "session_no")
    anchored = (
        with_session_no(events)
        .withColumn(
            "v", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(sess)
        )
        .withColumn(
            "c",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("v")),
                    F.col("ts"),
                )
            ).over(sess),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c")),
                    F.col("ts"),
                )
            ).over(sess),
        )
    )
    per_session = anchored.groupBy("user_id", "session_no").agg(
        F.when(F.max("p").isNotNull(), 3)
        .when(F.max("c").isNotNull(), 2)
        .when(F.max("v").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("funnel_stage")
    )
    return per_session.groupBy("funnel_stage").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


# --------------------------------------------------------------------------- #
# EWMA trend — dyadic weights make the smoothing EXACT integer arithmetic.
# --------------------------------------------------------------------------- #

EWMA_LAGS = 16  # weight floor 2^-16 ~ 1.5e-5: the truncation IS the definition


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"COALESCE(LAG(c, {j}) OVER win, 0) * {1 << (EWMA_LAGS - 1 - j)}"
        for j in range(EWMA_LAGS)
    )
    return f"""
WITH d AS (
  SELECT o_orderpriority AS prio,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT prio, day, c,
         {terms} AS num,
         LEAST(row_number() OVER win, {EWMA_LAGS}) AS m
  FROM d WINDOW win AS (PARTITION BY prio ORDER BY day)
)
SELECT prio, day, CAST(c AS BIGINT) AS revenue_cents,
       CAST(num AS DOUBLE)
         / CAST({1 << EWMA_LAGS} - (1 << ({EWMA_LAGS} - m)) AS DOUBLE)
         AS ewma_cents
FROM w
"""
# CAST(c AS BIGINT): DuckDB's SUM(BIGINT) yields HUGEINT, which pandas
# receives as float64 — a stringification mismatch against Spark's int64
# under the driver's hash (the round-9 hash-FAIL root cause). Every oracle
# output column must leave DuckDB as BIGINT/DOUBLE, never HUGEINT
# (regression-guarded by tests/test_oracle_types.py).


@register("priority_revenue_ewma", oracle=_ewma_oracle(), tags=("bench", "temporal"))
def priority_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per order
    priority — the classic trend smoother, made hash-gateable by choosing
    DYADIC weights: α = 1/2 truncated at 16 lags means every weight is a
    power of two, so the weighted numerator Σ cents·2^(15-j) and the
    renormalizing denominator 2^16 − 2^(16-m) (m = available lags) are
    EXACT integers in any engine, and the only float op is one final IEEE
    division. The usual EWMA recursion s_t = αx + (1-α)s_{t-1} is a
    sequential float chain whose rounding no two engines replay; the
    16-term closed form is its ≤1.5e-5-relative-weight truncation and is
    order-free.

    Scale shape: one groupBy to day grain (calendar-bounded), then ONE
    window pass per priority computing all 16 LAGs — partitioned windows
    parallelize across groups, and the window input is days, not orders.
    Reference parity: extends the daily summaries
    (/root/reference/pipeline/silver_to_gold.py:47-96) with the trend
    column a forecasting Gold table needs."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "o_totalprice",
    )
    daily = orders.groupBy("prio", "day").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
    )
    win = Window.partitionBy("prio").orderBy("day")
    num = None
    for j in range(EWMA_LAGS):
        t = F.coalesce(F.lag("c", j).over(win), F.lit(0)) * F.lit(
            1 << (EWMA_LAGS - 1 - j)
        )
        num = t if num is None else num + t
    m = F.least(F.row_number().over(win), F.lit(EWMA_LAGS))
    staged = daily.select(
        "prio", "day", "c", num.alias("num"), m.alias("m")
    )
    den = F.expr(f"shiftleft(1, {EWMA_LAGS}) - shiftleft(1, {EWMA_LAGS} - m)")
    return staged.select(
        "prio",
        "day",
        F.col("c").alias("revenue_cents"),
        (F.col("num").cast("double") / den.cast("double")).alias("ewma_cents"),
    )


# --------------------------------------------------------------------------- #
# OLS trendline — closed-form regression from exact integer moment sums.
# --------------------------------------------------------------------------- #

_TREND_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS prio,
         CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
),
x AS (
  SELECT prio, y,
         date_diff('day', MIN(day) OVER (PARTITION BY prio), day) AS x
  FROM d
),
m AS (
  SELECT prio, COUNT(*) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM x GROUP BY prio
)
SELECT prio, n AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
         / (CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)) AS r_squared
FROM m
"""


@register(
    "priority_revenue_trendline", oracle=_TREND_ORACLE, tags=("temporal",)
)
def priority_revenue_trendline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares revenue trend per priority — slope (cents/day) and R²
    of daily revenue against elapsed days, the closed-form regression
    n·Σxy−Σx·Σy / n·Σx²−(Σx)². Every moment sum is EXACT: x = days since
    the group's first day (small int), y = daily cents (long), products
    accumulated as DECIMAL(38,0) so nothing rounds until the final IEEE
    division — cross-engine determinism well inside the gate's 12
    significant digits. The five moments are classic map-side-combinable
    partials: ONE pass, one KB-scale shuffle, whatever the corpus size
    (the same one-pass-moments trick as `qty_price_correlation`'s Pearson).
    Reference parity: the trend column `forecast_revenue_change`'s naive
    delta can't provide (/root/reference/pipeline/silver_to_gold.py:47-96
    has daily revenue but no fit)."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("prio", "day")
        .agg(F.sum("cents").alias("y"))
    )
    x = daily.select(
        "prio",
        "y",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("prio"))
        ).alias("x"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = x.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        dec(F.sum(dec(F.col("x")) * F.col("x"))).alias("sxx"),
        dec(F.sum(dec(F.col("x")) * F.col("y"))).alias("sxy"),
        dec(F.sum(dec(F.col("y")) * F.col("y"))).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "prio",
        F.col("n").alias("n_days"),
        (num.cast("double") / den.cast("double")).alias("slope_cents_per_day"),
        (
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * deny.cast("double"))
        ).alias("r_squared"),
    )


# --------------------------------------------------------------------------- #
# CUSUM change detection — the recursive alarm as an exact window identity.
# --------------------------------------------------------------------------- #

CUSUM_H_NUM = 4  # alarm threshold h = 4·k (in units of the reference value)

_CUSUM_ORACLE = f"""
WITH d AS (
  SELECT o_orderpriority AS prio,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1, 2
),
k AS (SELECT prio, (5 * SUM(c)) // (4 * COUNT(*)) AS k FROM d GROUP BY prio),
w AS (
  SELECT d.prio, d.day, d.c, k.k,
         SUM(d.c) OVER win - k.k * (row_number() OVER win) AS drift
  FROM d JOIN k ON k.prio = d.prio
  WINDOW win AS (PARTITION BY d.prio ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT prio, day, c, k,
         drift - LEAST(0, COALESCE(MIN(drift) OVER (
           PARTITION BY prio ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)) AS cusum
  FROM w
)
SELECT prio, day, CAST(c AS BIGINT) AS revenue_cents,
       CAST(cusum AS BIGINT) AS cusum_cents
FROM s WHERE cusum > {CUSUM_H_NUM} * k
"""
# CASTs: avoid HUGEINT outputs (pandas float64) — see the EWMA oracle note.


@register("revenue_cusum_alerts", oracle=_CUSUM_ORACLE, tags=("temporal", "quality"))
def revenue_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM upward-shift alarms on daily revenue per priority (Page 1954):
    days where the one-sided cumulative sum S_t = max(0, S_{t-1} + x_t − k)
    exceeds h = 4k, with the standard allowance built into the reference
    value k = 1.25·mean (integer form (5·total) DIV (4·days)): a CUSUM
    referenced at the plain mean is a zero-drift reflected random walk that
    alarms constantly; the +25% allowance makes drift negative in-control,
    so only a genuine upward shift accumulates to the alarm line.
    The textbook form is a sequential max-recursion no two
    engines replay bit-identically in floats and no window expresses
    directly — but it has an exact prefix identity:

        S_t = (P_t − k·t) − min(0, min_{j≤t−1}(P_j − k·j))

    (P = running revenue sum), i.e. one running-sum window and one
    running-min window over the drift series. (The textbook S_t also mins
    over j = t, which floors it at 0; the two forms differ only when the
    true S_t = 0, and 0 never crosses the positive alarm line — so the
    FLAGGED set, and every emitted alarm value, is exactly the textbook
    CUSUM's. The planted-shift unit test replays the recursion directly.) With revenue in integer
    cents and the reference k = total DIV days (integer division), every
    term is exact int64, so alarm membership is bit-identical cross-engine
    — the same recursion-to-window unlock as the EWMA's closed form.

    Scale shape: one day-grain agg (calendar-bounded), a 2-row-frame
    window pass per priority, and a broadcast of the G-row k table. The
    min(0, ·) guard rides on COALESCE(first row) + the fact that
    drift_0 − min-prefix can never go below 0 once 0 is in the prefix set
    — handled by clamping the prefix min at 0."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("prio", "day")
        .agg(F.sum("cents").alias("c"))
    )
    k = daily.groupBy("prio").agg(
        F.expr("(5 * sum(c)) div (4 * count(*))").alias("k")
    )
    win = Window.partitionBy("prio").orderBy("day")
    run = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = win.rowsBetween(Window.unboundedPreceding, -1)
    drift = F.sum("c").over(run) - F.col("k") * F.row_number().over(win)
    staged = daily.join(F.broadcast(k), "prio").select(
        "prio", "day", "c", "k", drift.alias("drift")
    )
    cusum = F.col("drift") - F.least(
        F.lit(0).cast("long"), F.coalesce(F.min("drift").over(prev), F.lit(0))
    )
    out = staged.select(
        "prio", "day", F.col("c").alias("revenue_cents"),
        cusum.alias("cusum_cents"), "k",
    )
    return out.where(
        F.col("cusum_cents") > F.lit(CUSUM_H_NUM) * F.col("k")
    ).select("prio", "day", "revenue_cents", "cusum_cents")


# --------------------------------------------------------------------------- #
# Distribution drift — two-sample chi-square over the priority mix.
# --------------------------------------------------------------------------- #

DRIFT_SPLIT_YEAR = 1998  # p1 = orders before this year, p2 = from it on

_DRIFT_ORACLE = f"""
WITH cells AS (
  SELECT CASE WHEN year(o_orderdate) < {DRIFT_SPLIT_YEAR} THEN 'p1' ELSE 'p2' END AS period,
         o_orderpriority AS prio, COUNT(*) AS o
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT period, prio, o,
         SUM(o) OVER (PARTITION BY period) AS r,
         SUM(o) OVER (PARTITION BY prio) AS c,
         SUM(o) OVER () AS n
  FROM cells
),
t AS (
  SELECT period, prio, o,
         CAST(
           (CAST(o AS DOUBLE) - (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE) - (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) / CAST(n AS DOUBLE))
           / ((CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) / CAST(n AS DOUBLE))
           AS DECIMAL(20,9)) AS term
  FROM m
),
p AS (
  SELECT prio,
         SUM(CASE WHEN period = 'p1' THEN o END) AS n_p1,
         SUM(CASE WHEN period = 'p2' THEN o END) AS n_p2,
         SUM(term) AS chi2_sum
  FROM t GROUP BY prio
)
SELECT prio, CAST(n_p1 AS BIGINT) AS n_p1, CAST(n_p2 AS BIGINT) AS n_p2,
       CAST(chi2_sum AS DOUBLE) AS chi2_contrib,
       CAST(SUM(chi2_sum) OVER () AS DOUBLE) AS chi2_total
FROM p
"""


@register("priority_mix_drift", oracle=_DRIFT_ORACLE, tags=("temporal", "quality"))
def priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample chi-square drift test on the order-priority mix between
    eras (pre/post {split}): the data-drift check a training pipeline runs
    before trusting a new snapshot — "did the label/source distribution
    move?". Pearson's X² = Σ (O−E)²/E over the G×2 contingency table, with
    E from the margins. Cross-engine float discipline is the perplexity
    recipe: O, margins, and N are exact longs; each cell's term is a fixed
    IEEE op sequence from identical operands, QUANTIZED to DECIMAL(20,9)
    before any sum, so the per-priority contributions and the total are
    order-independent exact decimal adds.

    Scale shape: ONE fact-table aggregate down to the G×2 cell grain;
    everything after runs on ≤10 rows (window margins over the bounded
    enum, no joins at all)."""
    prio_period = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.when(F.year("o_orderdate") < DRIFT_SPLIT_YEAR, "p1")
        .otherwise("p2")
        .alias("period"),
    )
    cells = prio_period.groupBy("period", "prio").agg(
        F.count(F.lit(1)).alias("o")
    )
    w_per = Window.partitionBy("period")
    w_prio = Window.partitionBy("prio")
    w_all = Window.partitionBy()
    m = cells.select(
        "period",
        "prio",
        "o",
        F.sum("o").over(w_per).alias("r"),
        F.sum("o").over(w_prio).alias("c"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = (F.col("r").cast("double") * F.col("c").cast("double")) / F.col(
        "n"
    ).cast("double")
    term = (
        ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)) / e
    ).cast("decimal(20,9)")
    p = m.select("period", "prio", "o", term.alias("term")).groupBy("prio").agg(
        F.sum(F.when(F.col("period") == "p1", F.col("o"))).alias("n_p1"),
        F.sum(F.when(F.col("period") == "p2", F.col("o"))).alias("n_p2"),
        F.sum("term").alias("chi2_sum"),
    )
    # Exact decimal sums internally; one final cast to DOUBLE on BOTH sides
    # (a trailing-zero Decimal string and its float render differ — the
    # perplexity recipe's closing move).
    return p.select(
        "prio",
        "n_p1",
        "n_p2",
        F.col("chi2_sum").cast("double").alias("chi2_contrib"),
        F.sum("chi2_sum")
        .over(Window.partitionBy())
        .cast("double")
        .alias("chi2_total"),
    )


# --------------------------------------------------------------------------- #
# Conversion latency quantiles — as-of join composed with the DDSketch.
# --------------------------------------------------------------------------- #

def _conv_latency_oracle() -> str:
    from ..functions.sketches import DD_GAMMA, DD_LNG, DD_QS

    sels = ",\n         ".join(
        f"MIN(CASE WHEN 100 * cum >= {int(round(q * 100))} * total"
        f" THEN bucket END) AS b{int(q * 100)}"
        for q in DD_QS
    )
    ests = ",\n       ".join(
        f"2 * power({DD_GAMMA!r}, b{int(q * 100)}) / {DD_GAMMA + 1!r}"
        f" AS p{int(q * 100)}_lat_sec"
        for q in DD_QS
    )
    return f"""
WITH lat AS (
  SELECT epoch(p.ts) - epoch(c.ts) AS sec
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
  WHERE epoch(p.ts) - epoch(c.ts) > 0
),
b AS (
  SELECT CAST(ceil(ln(CAST(sec AS DOUBLE)) / {DD_LNG!r}) AS BIGINT) AS bucket
  FROM lat
),
m AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
cum AS (
  SELECT bucket,
         SUM(c) OVER (ORDER BY bucket) AS cum,
         SUM(c) OVER () AS total
  FROM m
),
sel AS (SELECT MAX(total) AS n_conversions, {sels} FROM cum)
SELECT CAST(n_conversions AS BIGINT) AS n_conversions,
       {ests}
FROM sel
"""


@register(
    "conversion_latency_ddsketch",
    oracle=_conv_latency_oracle(),
    tags=("temporal", "sketch", "approx"),
)
def conversion_latency_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency quantiles (p50/p90/p99 seconds) —
    two verified operators COMPOSED: the union-merge as-of join
    (operators/asof.py: one shuffle on user_id, running carry-forward, no
    range join) produces each purchase's preceding click, and the
    mergeable DDSketch turns the integer-second latencies into ±1%
    quantiles. The oracle replays the composition with DuckDB's native
    ASOF JOIN — so Spark's hand-rolled as-of is cross-checked against an
    independent engine's as-of semantics INSIDE a larger pipeline, not
    just standalone. Latencies are exact integer seconds (epoch diffs);
    zero-latency pairs are outside the log-bucket domain and excluded on
    both sides; bucket selection is the scaled-integer walk.

    Scale shape: as-of is one user-keyed shuffle; the sketch collapses to
    ≤~700 buckets before its only exchange."""
    from ..functions.sketches import dd_quantiles
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts", out_col="click_ts")
    sec = F.unix_timestamp("ts") - F.unix_timestamp("click_ts")
    lat = joined.where(F.col("click_ts").isNotNull() & (sec > 0)).select(
        sec.alias("sec")
    )
    from ..functions.sketches import dd_bucket

    buckets = lat.groupBy(dd_bucket(F.col("sec").cast("double")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )
    out = dd_quantiles(buckets, [], total_alias="n_conversions")
    return out.select(
        "n_conversions",
        F.col("p50_est").alias("p50_lat_sec"),
        F.col("p90_est").alias("p90_lat_sec"),
        F.col("p99_est").alias("p99_lat_sec"),
    )


# --------------------------------------------------------------------------- #
# One-way ANOVA — does day-of-week move order value? Exact moment sums.
# --------------------------------------------------------------------------- #

_ANOVA_ORACLE = """
WITH x AS (
  SELECT dayofweek(o_orderdate) AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
g AS (
  SELECT dow, COUNT(*) AS n_g,
         CAST(SUM(v) AS DECIMAL(38,0)) AS s_g,
         CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS ss_g
  FROM x GROUP BY dow
),
tot AS (
  SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
         CAST(SUM(ss_g) AS DECIMAL(38,0)) AS ss,
         SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
           AS sum_sq_over_n
  FROM g
)
SELECT CAST(k AS BIGINT) AS n_groups, n AS n_rows,
       (sum_sq_over_n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(ss AS DOUBLE) - sum_sq_over_n)
         * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
         AS f_stat
FROM tot
"""


@register("weekday_revenue_anova", oracle=_ANOVA_ORACLE, tags=("temporal", "eval"))
def weekday_revenue_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for "does day-of-week shift order value?"
    — the seasonality screen run before building weekday features. SSB and
    SSW come from per-group exact moments (counts, DECIMAL(38,0) sums and
    square-sums of integer cents), so the group statistics are
    order-independent at any parallelism. The one float summation is
    Σ s_g²/n_g — seven positive terms whose association order could differ
    between engines by ≤ a few ulps; like the cosine oracles, this leans
    on the gate's 12-significant-digit float rounding rather than decimal
    quantization (the closing F expression is a fixed shape of single IEEE
    ops from those operands).

    Scale shape: one fact agg to the 7-group grain with map-side combine;
    everything else is 7 rows."""
    x = load_table(spark, sf_dir, "orders").select(
        F.dayofweek("o_orderdate").alias("dow"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = x.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_g"),
        dec(F.sum("v")).alias("s_g"),
        dec(F.sum(dec(F.col("v")) * F.col("v"))).alias("ss_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        dec(F.sum("s_g")).alias("s"),
        dec(F.sum("ss_g")).alias("ss"),
        F.sum(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("sum_sq_over_n"),
    )
    k_d, n_d = F.col("k").cast("double"), F.col("n").cast("double")
    s_d, ss_d = F.col("s").cast("double"), F.col("ss").cast("double")
    ssb = F.col("sum_sq_over_n") - s_d * s_d / n_d
    ssw = ss_d - F.col("sum_sq_over_n")
    return tot.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").alias("n_rows"),
        (ssb / ssw * (n_d - k_d) / (k_d - F.lit(1.0))).alias("f_stat"),
    )


# --------------------------------------------------------------------------- #
# Session path mining — most common opening event sequences.
# --------------------------------------------------------------------------- #

PATHS_TOP = 20

_PATHS_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_no
  FROM ordered
),
p AS (
  SELECT array_to_string(
           (array_agg(event_type ORDER BY ts, event_id))[1:3], '>') AS path
  FROM sess GROUP BY user_id, session_no
)
SELECT path, COUNT(*) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATHS_TOP}
"""


@register("top_session_paths", oracle=_PATHS_ORACLE, tags=("temporal", "window"))
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {PATHS_TOP} most common session OPENINGS — each session reduced
    to its first three event types ('view>click>purchase', …), the path
    profile funnel/UX analysis starts from. Reuses the verified gap
    sessionizer (`with_session_no` — the same rule the oracle replays as
    gaps-and-islands SQL); the opening sequence comes from one
    sort-then-slice over each session's collected (ts, event_id, type)
    structs, totally ordered by the same keys both engines sort by, so the
    path strings are byte-identical.

    Scale shape: sessionization is one user-keyed shuffle shared by both
    window frames; sessions collapse to one path row each before the
    path-grain count, and the top-20 is TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    s = with_session_no(ev)
    first3 = s.groupBy("user_id", "session_no").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                3,
            ),
        ).alias("path")
    )
    return (
        first3.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATHS_TOP)
    )
