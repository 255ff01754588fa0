"""transformWithStateInPandas (state API v2) — streaming first-seen dedup.

The end-to-end streaming test needs google.protobuf (the transformWithState
worker protocol), absent in this sandbox — it auto-skips here and runs on a
standard cluster. The processor's logic is covered unconditionally below via
a fake state handle."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.streaming.state import (
    FirstSeenProcessor,
    streaming_first_seen,
)

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB)  # required by transformWithState
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes → deterministic file order


def _run(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_first_seen(stream, key_col="user_id", ts_col="ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r["key"]: r["first_ts"]
        for r in spark.read.parquet(out).collect()
    }


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def _feed(proc, key, ts_list):
    return list(
        proc.handleInputRows(
            (key,), iter([pd.DataFrame({"ts": pd.to_datetime(ts_list)})]), None
        )
    )


def test_first_seen_processor_logic_with_fake_state():
    proc = FirstSeenProcessor()
    proc.init(_FakeHandle())
    out1 = _feed(proc, "u1", ["2024-01-01 10:00:30", "2024-01-01 10:00:10"])
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert row["key"] == "u1"
    assert str(row["first_ts"]) == "2024-01-01 10:00:10"  # batch minimum
    assert row["n_in_batch"] == 2
    # Re-occurrence of the same key: suppressed.
    assert _feed(proc, "u1", ["2024-01-01 11:00:00"]) == []
    # All-null event times never seed state.
    proc2 = FirstSeenProcessor()
    proc2.init(_FakeHandle())
    assert (
        list(
            proc2.handleInputRows(
                ("u2",), iter([pd.DataFrame({"ts": [None, None]})]), None
            )
        )
        == []
    )


def test_first_seen_dedup_across_batches_and_restarts(spark, tmp_path, rocksdb_state):
    pytest.importorskip("google.protobuf")  # transformWithState worker protocol
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    _write_batch(
        spark,
        src,
        [(1, "2024-01-01 10:00:30"), (1, "2024-01-01 10:00:10"), (2, "2024-01-01 10:01:00")],
    )
    _write_batch(
        spark,
        src,
        [(1, "2024-01-01 11:00:00"), (3, "2024-01-01 11:02:00")],  # 1 is a re-occurrence
    )
    got = _run(spark, src, out, ckpt)
    # One row per distinct key; key 1 keeps its batch-1 minimum, not the
    # batch-2 re-occurrence.
    assert set(got) == {"1", "2", "3"}
    assert str(got["1"]) == "2024-01-01 10:00:10"

    # Restart with the same checkpoint: state survives — old keys suppressed,
    # only the genuinely new key emits.
    _write_batch(
        spark,
        src,
        [(2, "2024-01-01 12:00:00"), (4, "2024-01-01 12:00:05")],
    )
    got2 = _run(spark, src, out, ckpt)
    assert set(got2) == {"1", "2", "3", "4"}
    assert str(got2["2"]) == "2024-01-01 10:01:00"  # unchanged
    assert str(got2["4"]) == "2024-01-01 12:00:05"
