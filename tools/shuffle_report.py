"""Per-query shuffle/input-volume report over the bench set.

Measures what the plan audit can only infer: for every bench-tagged query,
the BYTES actually moved through shuffles, from the Spark REST API's
per-stage metrics (the same numbers the UI shows). This is the ground truth
for scale claims — a query whose shuffle volume is small relative to its
table footprint is map-side-bound and scales with cluster FLOPs; one that
shuffles ~its input re-pays the network at every scale-up.

Caveat: per-stage ``inputBytes`` under-reports with the vectorized parquet
reader on local filesystems (observed ~0 for multi-MB scans), so this report
intentionally sticks to ABSOLUTE shuffle write/read volumes — compare them
against the known on-disk table sizes of the sf_dir, not against inputBytes.

Usage: python tools/shuffle_report.py [sf_dir]
Prints one line per query and a final JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.plans.registry import bench_queries  # noqa: E402
from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402


def _stages(base: str, app_id: str) -> dict:
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("shuffle_report", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    out: dict[str, dict] = {}
    for name, q in bench_queries().items():
        before = _stages(base, app_id)
        q.build(spark, sf_dir).collect()
        after = _stages(base, app_id)
        new = [s for k, s in after.items() if k not in before]
        row = {
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in new) / 1e6, 2
            ),
            "stages": len(new),
        }
        out[name] = row
        print(
            f"{name:34s} shuffle_w={row['shuffle_write_mb']:8.2f}MB "
            f"shuffle_r={row['shuffle_read_mb']:8.2f}MB stages={row['stages']}"
        )

    print(json.dumps({"metric": "shuffle_report", "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
