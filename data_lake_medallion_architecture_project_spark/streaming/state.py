"""Second-generation stateful streaming via ``transformWithStateInPandas``
(Spark 4.x arbitrary-state API v2).

``streaming/windows.py`` shows the v1 API (``applyInPandasWithState``: one
opaque state tuple + one timeout per key). The v2 API used here is the one
new stateful operators should target: named, schema'd state variables with
per-variable TTL, explicit processor lifecycle (``init``/``close``), timers,
and initial-state bootstrap.

``streaming_first_seen`` — exactly-once *streaming* dedup, the incremental
twin of ``operators/dedup.py:exact_dedup``: emit each key's first-ever row,
suppress every later occurrence across micro-batches and restarts (state in
the checkpoint). The optional TTL bounds state for unbounded key domains —
at 100 TB of events the key space never fits an executor, but per-key state
lives in the state store (RocksDB on a cluster) and expires after the TTL,
which is the standard watermark-style compromise for streaming dedup.

The reference has no streaming or dedup at all; this is north-star extension
surface (SURVEY.md §2.8).

Runtime requirements: the transformWithState Python worker speaks protobuf to
the JVM state server (``pyspark/sql/streaming/proto``), so ``google.protobuf``
must be importable on the workers, and the state store must be RocksDB
(``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider``).
This sandbox lacks protobuf, so the end-to-end streaming test auto-skips
there (``tests/test_streaming_state.py``); the processor's dedup logic itself
is unit-tested against a fake state handle, and the operator runs unchanged
on any standard Spark 4.x cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

FIRST_SEEN_OUTPUT = "key string, first_ts timestamp, n_in_batch long"


class FirstSeenProcessor(StatefulProcessor):
    """Emit the first row ever observed per key; drop all later ones.

    State: one ValueState holding the first-seen event time (micros). A key
    present in state emits nothing — dedup across batches and restarts."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._first = handle.getValueState(
            "first_seen_us", "us long", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = 0
        best_us: int | None = None
        for pdf in rows:
            ts = pd.to_datetime(pdf["ts"], errors="coerce").dropna()
            n += len(pdf)
            if len(ts):
                batch_min = int(ts.min().value // 1000)
                best_us = batch_min if best_us is None else min(best_us, batch_min)
        if self._first.exists() or best_us is None:
            return iter(())  # seen before (or no usable event time): suppress
        self._first.update((best_us,))
        return iter(
            [
                pd.DataFrame(
                    {
                        "key": [key[0]],
                        "first_ts": [pd.Timestamp(best_us, unit="us")],
                        "n_in_batch": [n],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-only stream: one output row per distinct key, carrying
    the earliest event time seen in the key's first batch. TTL (processing
    time) bounds state for unbounded key spaces; None keeps keys forever."""
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts")
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        FirstSeenProcessor(ttl_ms),
        outputStructType=FIRST_SEEN_OUTPUT,
        outputMode="Append",
        timeMode="None",
    )
