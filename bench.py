"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Headline set = queries tagged "bench" in the registry (scan-heavy aggregate,
join chains, pivot, window, dedup, text, similarity) — the queries whose plan
shape matters at 100 TB.

Cross-session protocol (round 13, per VERDICT r12 item 2): the whole query
set runs in THREE fresh JVM subprocesses and the reported time is the
per-query MEDIAN across sessions of each session's best-of-k interleaved
passes. Rationale: rounds 6 and 8 produced 15-55% apparent per-query
"regressions" on byte-identical code that fresh-session re-measurement
refuted, and round 12's official total drifted +12.4% across 29 UNTOUCHED
queries — single-session (and best-of-two-session) numbers conflate plan
cost with host/JIT/session drift; the median of three sessions is robust to
one slow AND one fast outlier session. The JSON also carries the observed
between-session delta (``session_delta_pct`` per query,
``median_session_delta_pct`` overall), the noise floor any round-over-round
comparison should be read against. Per-query spread is the MEDIAN across
sessions of each session's warm-sample spread (single max dropped when a
session has ≥4 warm samples) — within-session repeatability, deliberately
separated from between-session drift, which ``session_delta_pct`` carries;
``spread_abs_sec`` gives the same quantity in seconds, because on sub-
second queries a ±60 ms scheduler/GC wobble reads as a large percentage
while being pure noise floor. Set SPARK_GRAFT_BENCH_SESSIONS=1 for a
quick single-session run (reported value falls back to that session's
best).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Queries whose r10/r12 BENCH_DETAIL warm-pass spread exceeded 25% — they get
# two extra interleaved passes (5 samples) and a single-max-trimmed spread, so
# the reported noise floor reflects their typical cost rather than one outlier
# run. (daily_sales_summary / large_orders / bpe_encoded_token_counts joined
# in r13: 30-52% spreads in BENCH_r12's detail.)
_NOISY_TAIL = frozenset(
    {
        "contrastive_training_triples",
        "purchases_with_last_click",
        "customer_activity_summary",
        "orders_reconciliation_diff",
        "daily_sales_summary",
        "large_orders",
        "bpe_encoded_token_counts",
    }
)


def run_pass(sf_dir: str) -> dict[str, dict]:
    """One full bench pass in THIS process: best-of-3 fresh plans per query
    (pass 1 pays codegen + C2 JIT; each pass rebuilds the plan so shuffle
    reuse can't under-report). Passes are INTERLEAVED — pass p runs every
    query once before any query's pass p+1 — so repeats of the same query
    are spaced across the session and a transient host stall inflates at
    most one sample per query instead of a query's whole triple (the round-
    10 noisy-tail postmortem: back-to-back repeats correlate their noise).
    Queries in ``_NOISY_TAIL`` get two extra interleaved passes (5 samples)
    and their spread is computed over the warm samples with the single max
    dropped. Returns {query: {"best": s, "spread_pct": p}}."""
    from data_lake_medallion_architecture_project_spark.plans.registry import (
        REGISTRY,
        bench_queries,
    )
    from data_lake_medallion_architecture_project_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer caches with a trivial action so the first
    # measured query doesn't pay session startup.
    REGISTRY["top_orders"].build(spark, sf_dir).limit(1).collect()

    qs = bench_queries()
    runs: dict[str, list[float]] = {n: [] for n in qs}
    for p in range(5):
        for name, q in qs.items():
            if p >= 3 and name not in _NOISY_TAIL:
                continue
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            runs[name].append(time.perf_counter() - t0)

    out: dict[str, dict] = {}
    for name, rs in runs.items():
        # The session's contribution: its best pass, plus the raw WARM
        # samples (pass 2+) — the parent pools warm samples across sessions
        # for the reported spread (r13 protocol).
        out[name] = {
            "best": round(min(rs), 3),
            "warm": [round(s, 3) for s in rs[1:]],
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3"))

    if os.environ.get("_SPARK_GRAFT_BENCH_CHILD"):
        print("\n" + json.dumps(run_pass(sf_dir)))
        return

    passes: list[dict[str, dict]] = []
    if n_sessions <= 1:
        passes.append(run_pass(sf_dir))
    else:
        env = dict(os.environ, _SPARK_GRAFT_BENCH_CHILD="1")
        for _ in range(n_sessions):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(proc.returncode)
            # The child's result is the LAST stdout line that parses as a
            # JSON object — JVM shutdown/log noise printed after (or before)
            # the result line must not lose a completed pass.
            parsed = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    candidate = json.loads(line)
                except ValueError:
                    continue
                if isinstance(candidate, dict):
                    parsed = candidate
                    break
            if parsed is None:
                sys.stderr.write(proc.stdout[-4000:])
                raise SystemExit("bench child produced no JSON result line")
            passes.append(parsed)

    names = list(passes[0])

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else 0.5 * (s[mid - 1] + s[mid])

    # Reported value: per-query MEDIAN across sessions of each session's
    # best pass — robust to one slow and one fast outlier session (r13
    # protocol). A single-session run degenerates to that session's best.
    timings = {
        n: round(median([p[n]["best"] for p in passes]), 3) for n in names
    }
    # Spread: each session's warm spread (single max dropped at >=4 warm
    # samples — one outlier is host noise, not plan cost), then the MEDIAN
    # across sessions. Pooling warm samples across sessions would conflate
    # within-session repeatability with between-session drift, which
    # session_delta_pct reports separately.
    spread = {}
    spread_abs = {}
    for n in names:
        per_sess_pct, per_sess_abs = [], []
        for p in passes:
            warm = sorted(p[n]["warm"])
            if len(warm) >= 4:
                warm = warm[:-1]
            per_sess_pct.append(
                100.0 * (warm[-1] - warm[0]) / max(warm[0], 1e-9)
            )
            per_sess_abs.append(warm[-1] - warm[0])
        spread[n] = round(median(per_sess_pct), 1)
        spread_abs[n] = round(median(per_sess_abs), 3)
    session_delta = {
        n: round(
            100.0
            * (max(p[n]["best"] for p in passes) - min(p[n]["best"] for p in passes))
            / max(min(p[n]["best"] for p in passes), 1e-9),
            1,
        )
        for n in names
    }
    deltas = sorted(session_delta.values())
    spreads = sorted(spread.values())
    detail = {
        "protocol": (
            f"median over {len(passes)} fresh-JVM sessions of per-session "
            "best-of-k interleaved passes (k=3, 5 for the noisy tail); "
            "spread = median across sessions of per-session warm spread "
            "(single max dropped at >=4 warm); session drift reported "
            "separately in session_delta_pct"
        ),
        "spread_pct": spread,
        "spread_abs_sec": spread_abs,
        "median_spread_pct": spreads[len(spreads) // 2] if spreads else None,
        "sessions": len(passes),
        "session_delta_pct": session_delta,
        "median_session_delta_pct": (
            deltas[len(deltas) // 2] if len(passes) > 1 else None
        ),
    }
    # Round-9 postmortem: the driver keeps only a ~2.2 KB tail of stdout and
    # parses the LAST line — a result line carrying per-query spread and
    # session-delta dicts grew past that window and the round lost its
    # official perf number (BENCH_r09.json parsed: null). The noise-floor
    # diagnostics therefore go to a sidecar file and a PRECEDING stdout line;
    # the final line stays compact (metric/value/unit/queries/sf only).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
