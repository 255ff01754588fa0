"""100× fact-volume probe — the second decade of the SCALE.md ladder.

Generates a 100×-replicated copy of sf0.1 (same key-shift replication as
``make_scale10.replicate``: 15 M orders / 60 M lineitem / 10 M events /
500 k documents, dimensions untouched) and measures, in ONE session:

1. Wall time at sf0.1 vs 100× (best-of-3 fresh plans, bench.py methodology)
   for the probe set: the four rewritten two-phase Gold summaries, the new
   sketch/LM queries, and the scan/join headline queries. Pair-ENUMERATION
   queries are excluded by design: 100 byte-identical twins per doc makes
   their true output quadratic in the dup factor (SCALE.md round-8 notes),
   so their wall time measures output size, not operator scaling.
2. The two-phase Gold rewrites HEAD-TO-HEAD against the single-pass
   countDistinct (Expand) forms they replaced, at 100× — the end-to-end
   wall-time confirmation the shuffle-volume win (29.5 → 0.61 MB) implies
   but does not prove (a tiny phase-1 output can let AQE coalesce the
   finish to too few partitions and serialize the final stage).
3. Final-stage parallelism for the rewritten queries, from the Spark REST
   API (numTasks of the highest new stageId) — detects exactly that
   AQE-coalesce failure mode.

Usage: python tools/make_scale100.py [src_sf_dir] [dst_dir]
Default: /root/testdata/sf0.1 -> /tmp/sfscale100 (generated once; reused if
the _SCALE_DONE marker exists). Prints per-query lines and one JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY  # noqa: E402
from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402
from data_lake_medallion_architecture_project_spark.sources.readers import load_table  # noqa: E402
from tools.make_scale10 import replicate  # noqa: E402

FACTOR = 100

# Probe set: rewritten Gold + round-8 sketch/LM ops + scan/join headliners.
PROBE = [
    "daily_sales_summary",
    "category_sales_summary",
    "payment_method_summary",
    "customer_activity_summary",
    "daily_event_summary",
    "doc_lm_perplexity",
    "hll_weekly_users_md5",
    "order_price_ddsketch",
    "pricing_summary",
    "region_nation_revenue",
    "customer_segment_revenue",
    "large_orders",
    "order_count_distribution",
    "customer_top_orders",
    "exact_dedup_documents",
    "doc_token_stats",
    "ivf_similarity_topk",
    "native_session_windows",
]

# The queries whose two-phase rewrite must prove itself end-to-end.
REWRITTEN = [
    "daily_sales_summary",
    "category_sales_summary",
    "customer_activity_summary",
]


def _expand_daily(spark, sf_dir):
    """The pre-round-8 A1 form: single-pass mixed countDistinct+SUM, which
    Catalyst plans as an Expand duplicating every fact row per grouping set."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
                      "o_totalprice", "o_custkey", "o_orderkey")
        .groupBy("date")
        .agg(
            F.sum("o_totalprice").alias("total_revenue"),
            F.count("o_orderkey").alias("order_count"),
            F.avg("o_totalprice").alias("avg_order_value"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )


def _expand_category(spark, sf_dir):
    """The pre-round-8 A2 form: fact⋈dim join then mixed countDistinct+SUM."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("date"),
        "l_partkey", "l_orderkey", "l_extendedprice",
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("date", F.col("p_brand").alias("category"))
        .agg(
            F.sum("l_extendedprice").alias("category_revenue"),
            F.countDistinct("l_orderkey").alias("category_orders"),
            F.avg("p_retailprice").alias("avg_unit_price"),
        )
    )


def _expand_activity(spark, sf_dir):
    """The pre-round-8 A4 form: TWO distincts + a count in one pass → ×3
    Expand of every event row through the exchange."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("date"),
                  "event_type", "event_id", "user_id", "props")
        .groupBy("date", "event_type")
        .agg(
            F.count("event_id").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.countDistinct("props").alias("unique_props"),
        )
    )


EXPAND_FORMS = {
    "daily_sales_summary": _expand_daily,
    "category_sales_summary": _expand_category,
    "customer_activity_summary": _expand_activity,
}


def _stages(base: str, app_id: str) -> dict:
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def _best_of(builder, spark, sf_dir, n=3) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        builder(spark, sf_dir).collect()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale100"

    spark = get_spark("make_scale100", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(dst, "_SCALE_DONE")
    if not os.path.exists(marker):
        print(f"generating {FACTOR}x replica at {dst} ...")
        t0 = time.perf_counter()
        replicate(spark, src, dst, FACTOR)
        with open(marker, "w") as f:
            f.write(f"factor={FACTOR} src={src}\n")
        print(f"generated in {time.perf_counter() - t0:.1f}s")

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # Warm the session once so the first measured plan doesn't pay startup.
    REGISTRY["top_orders"].build(spark, src).limit(1).collect()

    result: dict[str, dict] = {}
    for name in PROBE:
        q = REGISTRY[name]
        t_small = _best_of(q.build, spark, src)
        before = _stages(base, app_id)
        t_big = _best_of(q.build, spark, dst)
        after = _stages(base, app_id)
        new = [after[k] for k in after if k not in before]
        final_tasks = (
            max(new, key=lambda s: s["stageId"])["numTasks"] if new else None
        )
        row = {
            "sf0.1_s": t_small,
            "x100_s": t_big,
            "ratio": round(t_big / max(t_small, 1e-9), 1),
            "final_stage_tasks": final_tasks,
        }
        result[name] = row
        print(
            f"{name:32s} sf0.1={t_small:7.2f}s 100x={t_big:8.2f}s "
            f"ratio={row['ratio']:6.1f}x final_tasks={final_tasks}"
        )

    # Head-to-head: rewritten two-phase form vs the old Expand form at 100×.
    # INTERLEAVED passes (A,B,A,B,...), not sequential best-of-3 blocks:
    # within-session drift on a 60 s query is 10-25% (observed 54→70 s over
    # one probe session), larger than the effect being measured, and
    # interleaving puts both forms under the same drift.
    h2h: dict[str, dict] = {}
    for name in REWRITTEN:
        runs: dict[str, list] = {"two_phase": [], "expand": []}
        for _ in range(3):
            for key, fn in (
                ("two_phase", REGISTRY[name].build),
                ("expand", EXPAND_FORMS[name]),
            ):
                t0 = time.perf_counter()
                fn(spark, dst).collect()
                runs[key].append(time.perf_counter() - t0)
        row = {
            "two_phase_s": round(min(runs["two_phase"]), 3),
            "expand_s": round(min(runs["expand"]), 3),
        }
        row["speedup"] = round(row["expand_s"] / max(row["two_phase_s"], 1e-9), 2)
        h2h[name] = row
        print(
            f"h2h {name:28s} two_phase={row['two_phase_s']:7.2f}s "
            f"expand={row['expand_s']:7.2f}s speedup={row['speedup']:.2f}x"
        )

    print(json.dumps({
        "metric": "scale100_probe",
        "factor": FACTOR,
        "queries": result,
        "head_to_head": h2h,
        "total_sf0.1_s": round(sum(r["sf0.1_s"] for r in result.values()), 2),
        "total_x100_s": round(sum(r["x100_s"] for r in result.values()), 2),
    }))


if __name__ == "__main__":
    main()
