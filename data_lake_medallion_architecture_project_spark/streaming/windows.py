"""Streaming aggregations: watermarked tumbling windows and a custom
stateful sessionizer.

The reference has no streaming aggregation at all — Gold recomputes from all
Silver history every 30 minutes (SURVEY.md §2.8). These are the incremental
upgrades:

* ``windowed_event_counts`` — event-time tumbling windows with a watermark, so
  late data is folded in up to the lateness bound and state is evicted after
  it. This is the streaming twin of ``hourly_event_windows`` in
  plans/temporal.py (same result shape, incremental computation).
* ``streaming_sessionize`` — a custom stateful operator via
  ``applyInPandasWithState``: per-user session assembly with an inactivity
  gap, state = (current session start, last seen ts, counter), emitting a row
  per closed session. This is the pattern for operators Structured Streaming
  lacks natively. Session closure is **event-time** driven
  (``EventTimeTimeout`` + watermark), never wall-clock: the same input files
  always produce the same sessions, and an ``AvailableNow`` run terminates
  once the final watermark has fired all due timeouts (a
  ``ProcessingTimeTimeout`` variant would instead idle-loop in "cleaning up
  state" until real minutes elapse — untestable and nondeterministic).

Both run with file sources + ``Trigger.AvailableNow`` in tests; on a cluster
the same code points at Kafka/rate sources unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Watermark bounds state: windows older than (max event time − watermark)
    finalize and evict; later-arriving rows inside the bound still update
    their window (the reference, by contrast, silently double-processes or
    misses late files)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("close_reason", StringType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful per-user session assembly. Emits sessions closed by an
    in-batch gap ("gap") or by the watermark passing last_seen + gap
    ("timeout"); the still-open session lives in state across micro-batches
    (and across runs, via the checkpoint)."""
    (user_id,) = key

    def _emit(rows: list[tuple[int, int, int, str]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in rows],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in rows],
                "n_events": [c for _, _, c, _ in rows],
                "close_reason": [r for _, _, _, r in rows],
            }
        )

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _emit([(start_us, last_us, n, "timeout")])
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        # PERMISSIVE sources can deliver null event times; NaT.value is a huge
        # negative int that would corrupt session start/gap math — drop them.
        ts = pd.to_datetime(pdf["ts"], errors="coerce").dropna()
        ts_us.extend(int(t.value // 1000) for t in ts)
    ts_us.sort()

    if not ts_us:
        # Nothing usable this batch. Preserve existing state (re-arming its
        # timeout); with no prior state there is nothing to do — never seed a
        # session from NaT.
        if state.exists:
            start_us, last_us, n = state.get
            state.update((int(start_us), int(last_us), int(n)))
            due_ms = int(last_us) // 1000 + _GAP_US // 1000
            state.setTimeoutTimestamp(max(due_ms, state.getCurrentWatermarkMs() + 1))
        return

    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int, str]] = []
    for t in ts_us:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > _GAP_US:
            closed.append((int(start_us), int(last_us), int(n), "gap"))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    state.update((int(start_us), int(last_us), int(n)))
    # Event-time timeout: fire when the watermark passes last_seen + gap.
    # Spark requires the timeout timestamp to be strictly beyond the current
    # watermark; clamp for sessions already older than it.
    due_ms = int(last_us) // 1000 + _GAP_US // 1000
    state.setTimeoutTimestamp(max(due_ms, state.getCurrentWatermarkMs() + 1))

    if closed:
        yield _emit(closed)


def streaming_sessionize(stream: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Custom stateful operator: gap-based sessions over a user_id/ts stream
    via applyInPandasWithState (Arrow-batched, state bounded per key).

    The watermark both bounds late data and drives session closure: a session
    whose last event is > gap older than the watermark closes with reason
    "timeout". Deterministic — no processing-time dependence."""
    return (
        stream.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
