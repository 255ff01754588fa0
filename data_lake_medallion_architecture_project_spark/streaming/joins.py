"""Stream-stream joins — watermarked interval joins between two live streams.

The reference processes each domain independently and never correlates
streams (SURVEY.md §2.8); batch correlation exists in this repo as the range
join ``clicks_after_purchase`` (plans/temporal.py). This is its incremental
twin: purchases and clicks arrive as two unbounded streams, and each purchase
pairs with the same user's clicks in the following hour — continuously,
without recomputing history.

Spark executes this as a symmetric hash join with BOTH sides buffered in state;
unbounded state is the failure mode. Two things bound it, and both are
mandatory for correctness-at-scale:

* a **watermark on each side** — rows older than (max event time − watermark)
  can no longer join and are evicted;
* a **time-range join condition** (``c_ts`` within [``p_ts``, ``p_ts`` + 1 h))
  — tells the engine exactly how long a buffered row stays joinable, so state
  per key is O(rows in the window), independent of stream length.

Inner joins emit on match (append mode); the left-outer variant additionally
emits purchase-with-no-click rows, but only once the watermark proves no
matching click can still arrive — an ``AvailableNow`` run therefore needs the
final watermark pushed past the data (tests append a late sentinel file,
exactly like the windowed-aggregation tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_clicks_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each streaming purchase to the same user's clicks within
    [purchase ts, purchase ts + window).

    ``events`` is one streaming DataFrame of the events schema; both sides
    derive from it by filter (the common one-topic-many-types Kafka layout).
    Returns (purchase_id, user_id, p_ts, c_ts); with ``how="left_outer"``,
    purchases with no in-window click appear once with c_ts NULL."""
    # Each side's watermark clock advances only on rows that survive that
    # side's type filter (Catalyst pushes non-event-time filters below the
    # watermark node, so marking the unfiltered source does not change this),
    # and the join uses the MIN of the two clocks. Operationally that means a
    # side whose event type goes quiet stalls outer emission and state
    # eviction — the standard defense on a real bus is per-side heartbeat
    # events, which is exactly what the tests simulate with sentinel rows of
    # both types.
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") < F.col("p_ts") + F.expr(f"interval {window}"))
    )
    return p.join(c, cond, how).select("purchase_id", "user_id", "p_ts", "c_ts")
