"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
synthetic generators as a first-class ``spark.read.format(...)`` source.

The reference's generators are driver-side scripts that write CSV files
(``/root/reference/generator/*_generator.py``); the engine's equivalent batch
API is ``sources/synthetic.py``. This module closes the loop by mounting those
generators behind Spark's pluggable source interface, so a user can say::

    from data_lake_medallion_architecture_project_spark.sources.pydatasource import register_synthetic_source
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_medallion")
          .option("domain", "sales").option("n", 10_000)
          .option("seed", 7).option("partitions", 32).load())

and get executor-side, partition-parallel generation with the exact dirty-data
profile of the reference (corruption rates, duplicates, nullable FKs).

Scale design: ``partitions()`` splits the requested row count into independent
``InputPartition``s, each carrying its own derived seed — generation is
embarrassingly parallel, no driver materialization, and rows are deterministic
for a fixed (seed, partitions, now) regardless of executor placement. Each
partition is one generator "batch", so the per-batch duplicate-row behavior
(~5%) applies per partition, mirroring one reference tick per partition.
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Per-partition seeds must not be derived via hash() (PYTHONHASHSEED varies
# across worker processes); a fixed affine map keeps them reproducible.
_SEED_STRIDE = 100_003


class _GenPartition(InputPartition):
    def __init__(self, index: int, seed: int, n: int):
        self.index = index
        self.seed = seed
        self.n = n


class _SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.domain = options.get("domain", "sales")
        self.n = int(options.get("n", 100))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = max(1, int(options.get("partitions", 4)))
        self.now_iso = options.get("now")  # fixed clock => fully deterministic

    def partitions(self):
        base, extra = divmod(self.n, self.n_partitions)
        return [
            _GenPartition(i, self.seed * _SEED_STRIDE + i, base + (1 if i < extra else 0))
            for i in range(self.n_partitions)
        ]

    def read(self, partition: _GenPartition) -> Iterator[tuple]:
        # Runs on the Python worker: import locally so the partition object
        # stays a tiny picklable struct.
        from .synthetic import GENERATORS
        from ..schemas import BRONZE_SCHEMAS

        now = datetime.fromisoformat(self.now_iso) if self.now_iso else None
        rows = GENERATORS[self.domain](seed=partition.seed, n=partition.n, now=now)
        fields = BRONZE_SCHEMAS[self.domain].fieldNames()
        numeric = {
            f.name
            for f in BRONZE_SCHEMAS[self.domain].fields
            if f.dataType.typeName() == "double"
        }
        for r in rows:
            yield tuple(
                (float(r[f]) if (f in numeric and r[f] is not None) else r[f])
                for f in fields
            )


class SyntheticBatchDataSource(DataSource):
    """``format("synthetic_medallion")`` — options: domain (sales |
    customer_events | inventory), n, seed, partitions, now (ISO timestamp)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_medallion"

    def schema(self):
        from ..schemas import BRONZE_SCHEMAS

        return BRONZE_SCHEMAS[self.options.get("domain", "sales")]

    def reader(self, schema) -> _SyntheticReader:
        return _SyntheticReader(self.options)

    def streamReader(self, schema):
        return _SyntheticStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticBatchDataSource)


# --------------------------------------------------------------------------- #
# Streaming form — the generator as a Structured Streaming source.
# --------------------------------------------------------------------------- #


class _TickPartition(InputPartition):
    def __init__(self, tick: int, seed: int, n: int):
        self.tick = tick
        self.seed = seed
        self.n = n


class _SyntheticStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("synthetic_medallion")`` — a bounded,
    replayable stream of generator ticks (the reference's 5-minute generator
    DAG cadence as a source instead of a scheduler; ``ticks`` bounds the
    backfill and can be raised across restarts to continue it).

    Offsets are tick counters, so the exactly-once contract reduces to
    determinism: ``partitions(start, end)`` is one partition per tick with a
    seed derived from (seed, tick), and re-reading any offset range after a
    crash regenerates byte-identical rows — replayed micro-batches are
    idempotent at the source, not just at the sink. Executor-side generation,
    same dirty-data profile as the batch form."""

    def __init__(self, options: dict):
        self.domain = options.get("domain", "sales")
        self.rows_per_tick = int(options.get("rows_per_tick", 50))
        self.seed = int(options.get("seed", 42))
        self.now_iso = options.get("now")
        self.total_ticks = int(options.get("ticks", 1))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        # The source is a bounded, replayable backfill of `ticks` generator
        # ticks: the latest offset is a pure function of the options, never
        # of reader instance state — a restarted query resumes from its
        # checkpointed offset and drains exactly the missing ticks (raise
        # the option to extend the stream; lower offsets never change).
        return {"tick": self.total_ticks}

    def partitions(self, start: dict, end: dict):
        return [
            _TickPartition(t, self.seed * _SEED_STRIDE + t, self.rows_per_tick)
            for t in range(start["tick"], end["tick"])
        ]

    def commit(self, end: dict) -> None:
        pass

    def read(self, partition: _TickPartition) -> Iterator[tuple]:
        from ..schemas import BRONZE_SCHEMAS
        from .synthetic import GENERATORS

        now = datetime.fromisoformat(self.now_iso) if self.now_iso else None
        rows = GENERATORS[self.domain](seed=partition.seed, n=partition.n, now=now)
        fields = BRONZE_SCHEMAS[self.domain].fieldNames()
        numeric = {
            f.name
            for f in BRONZE_SCHEMAS[self.domain].fields
            if f.dataType.typeName() == "double"
        }
        for r in rows:
            yield tuple(
                (float(r[f]) if (f in numeric and r[f] is not None) else r[f])
                for f in fields
            )
