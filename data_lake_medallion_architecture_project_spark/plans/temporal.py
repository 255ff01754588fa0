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


@register("sessionize_events", oracle=_SESSION_ORACLE, tags=("temporal", "window"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum windows, one shuffle on
    user_id shared by both window frames."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("new_session", new_session)
        .select(
            "user_id",
            F.sum("new_session").over(running).cast("long").alias("session_no"),
            "event_id",
            "ts",
        )
    )


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
