"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All three functions are thin views over the engine's query registry
(``data_lake_medallion_architecture_project_spark.plans.REGISTRY``) — every operator is declared exactly once
there, with its Spark builder and oracle SQL side by side.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lake_medallion_architecture_project_spark.plans import REGISTRY

_REPO = os.path.dirname(os.path.abspath(__file__))


def _last_certified() -> dict[str, int]:
    """Query name -> latest round whose driver CORRECTNESS snapshot recorded a
    usable row (hash-green, or rows-only for a query that by design has no
    oracle). Built from the CORRECTNESS_r*.json files the driver leaves in the
    repo, so the staleness ledger maintains itself — no hand-edited frozensets.

    A query that GAINS an oracle after a rows-only row drops back to round 0
    (its old rows-only rows no longer certify the stronger contract), and a
    renamed registry entry starts at round 0 automatically."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if name not in REGISTRY or not isinstance(row, dict):
                continue
            hash_ok = row.get("hash_match") is True
            rows_only_ok = (
                row.get("err") == "no_oracle" and REGISTRY[name].oracle is None
            )
            if hash_ok or rows_only_ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def _ordered_names() -> list[str]:
    """Registry names, longest-uncertified first (never-certified = round 0;
    ties break on registry order), so the driver's 50-row CORRECTNESS window
    always re-certifies the stalest queries and every query gets a fresh
    official green row at worst every ceil(len(REGISTRY)/50) rounds."""
    stamp = _last_certified()
    names = list(REGISTRY)
    idx = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (stamp.get(n, 0), idx[n]))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["daily_sales_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return {name: REGISTRY[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
