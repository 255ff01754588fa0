"""Registry-wide DuckDB-oracle parity at sf0.001 — the in-repo mirror of the
driver's correctness gate (same compare: rows + columns + value hash)."""

from __future__ import annotations

import duckdb
import pytest

from data_lake_medallion_architecture_project_spark.plans import REGISTRY
from tests.conftest import SF_SMALL

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from check_oracle import value_hash  # noqa: E402

_ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    got = q.build(spark, SF_SMALL).toPandas()
    exp = duck.sql(q.oracle).df()
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    assert value_hash(got) == value_hash(exp)


def test_rows_only_queries_run(spark):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            assert q.build(spark, SF_SMALL).count() >= 0


def test_entry_contract(spark):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as e

    assert e.entry(spark).count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 20


def test_driver_contract_on_plain_session(spark):
    """The round driver builds its OWN SparkSession without this repo's tuned
    configs — queries must not depend on session-level settings (the classic
    trap: events.parquet's TIMESTAMP(NANOS) needs nanosAsLong, which
    load_table sets per-read, not per-session). newSession() gives a fresh
    SQLConf over the shared context, approximating the driver's environment
    in-suite."""
    import __spark_entry__ as e

    plain = spark.newSession()
    assert e.entry(plain).count() > 0
    # An events-reading query exercises the nanos-timestamp path.
    assert REGISTRY["sessionize_events"].build(plain, SF_SMALL).count() > 0
    # And the full contract surface stays importable/iterable.
    names = list(e.queries())
    assert len(names) == len(REGISTRY)
    assert set(e.oracle_sql()) <= set(names)
