"""Oracle output-type hygiene — the round-9 hash-FAIL regression guard.

Root cause of the four round-9 driver hash failures (priority_revenue_ewma,
revenue_cusum_alerts, part_price_volume_skyline, priority_order_anomalies):
DuckDB's SUM(BIGINT) returns HUGEINT (int128), and a HUGEINT result column
reaches pandas as float64. The Spark side of the same query returns int64.
The local gate's 12-significant-digit float formatting happened to make
"123456789" on both sides, but the driver's hash stringifies the two dtypes
differently — rows/schema matched, value-hash didn't. No local re-run could
reproduce it because the dtype coincidence holds at every sf we can run.

The durable rule: every oracle's RESULT columns must leave DuckDB as types
pandas maps 1:1 onto what Spark returns — BIGINT/INTEGER for integral,
DOUBLE for floating, VARCHAR/DATE/TIMESTAMP for the rest. HUGEINT (or
UHUGEINT) in an oracle's output schema is always a latent driver-gate
failure, so this test sweeps all registered oracles with a LIMIT-0 bind
(no data read — schema only) and fails on any hit.
"""

from __future__ import annotations

import duckdb
import pytest

from data_lake_medallion_architecture_project_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_no_hugeint_oracle_outputs(con):
    offenders = {}
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        rel = con.sql(f"SELECT * FROM ({q.oracle}) LIMIT 0")
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t)
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "HUGEINT oracle output columns (pandas float64 vs Spark int64 — "
        f"driver hash-FAIL class): {offenders}; wrap in CAST(... AS BIGINT)"
    )
