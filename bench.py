"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Headline set = queries tagged "bench" in the registry (scan-heavy aggregate,
join chains, pivot, window, dedup, text, similarity) — the queries whose plan
shape matters at 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY, bench_queries  # noqa: E402
from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer caches with a trivial action so the first
    # measured query doesn't pay session startup.
    REGISTRY["top_orders"].build(spark, sf_dir).limit(1).collect()

    # Three passes per query, report the best: the first runs pay one-time
    # codegen + C2 JIT compilation for that plan shape (observed 10s → 5s →
    # 2.2s on the heaviest query); the best pass is the steady-state cost a
    # long-running cluster actually sees. Each pass REBUILDS the plan from
    # scratch — re-collecting the same DataFrame object would silently reuse
    # shuffle outputs (skipped stages) and under-report.
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, q in bench_queries().items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        # Repeat-run variance over the two WARM passes (pass 1 pays codegen +
        # JIT and would conflate warmup with host noise) — the per-query
        # noise floor that round-over-round comparisons should be read
        # against (SCALE.md documents 15-25% host variance between rounds).
        warm = runs[1:]
        spread[name] = round(
            100.0 * (max(warm) - min(warm)) / max(min(warm), 1e-9), 1
        )

    spreads = sorted(spread.values())
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread_pct": spread,
                "median_spread_pct": spreads[len(spreads) // 2] if spreads else None,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
