"""Sketch-state incremental Gold (streaming/sketch_refresh.py): folding new
days into the day-grain register/bucket state must equal a from-scratch
build — the aggregate-level equivalence that lets distinct-count and
quantile Gold tables stop rescanning history."""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.functions.sketches import (
    dd_bucket_counts,
    dd_quantiles,
    hll_estimate,
    hll_registers,
)
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.sketch_refresh import (
    run_sketch_gold_refresh,
    quantiles_from_state,
    weekly_users_from_state,
)


def _events(spark, day_lo: int, day_hi: int):
    """Synthetic events: days 2024-03-<lo..hi>, overlapping user sets across
    days (so weekly distinct < sum of daily distincts), positive values."""
    rows = [
        (
            datetime(2024, 3, d, 12, 0, 0),
            f"user_{(d * 37 + i) % 500}",
            "A" if i % 3 else "B",
            float(1 + (i * 7 + d) % 900) + 0.25,
        )
        for d in range(day_lo, day_hi + 1)
        for i in range(400)
    ]
    return spark.createDataFrame(rows, ["ts", "user_id", "status", "value"])


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_sketch_fold_equals_full_recompute_on_append(spark, tmp_path):
    src = str(tmp_path / "events")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: days 1-7 land and fold.
    _events(spark, 1, 7).write.mode("append").parquet(src)
    run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value",
        kmv_group_col="status",
    )
    # Batch 2: days 5-12 (overlapping days 5-7 — the fold must MERGE into
    # existing day partitions, not just add new ones).
    _events(spark, 5, 12).write.mode("append").parquet(src)
    run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value",
        kmv_group_col="status",
    )

    full = spark.read.parquet(src)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")

    # State tables == from-scratch build over ALL data (exact row equality).
    hll_state = TxnTable(f"{state_root}/hll_day_registers").read(spark)
    direct_regs = hll_registers(full.select(day, "user_id"), ["day"], "user_id")
    assert _sorted(hll_state.select("day", "bucket", "r")) == _sorted(direct_regs)

    dd_state = TxnTable(f"{state_root}/dd_day_buckets").read(spark)
    direct_bks = dd_bucket_counts(
        full.select("status", day, "value"), ["status", "day"], "value"
    )
    assert _sorted(dd_state.select("status", "day", "bucket", "c")) == _sorted(
        direct_bks
    )

    # Serving rollups from state alone == direct sketch over all events.
    weekly = weekly_users_from_state(spark, TxnTable(f"{state_root}/hll_day_registers"))
    direct_weekly = hll_estimate(
        direct_regs.select(
            F.weekofyear(F.to_date("day")).cast("long").alias("week"), "bucket", "r"
        ),
        ["week"],
        alias="est_weekly_users",
    )
    assert _sorted(weekly) == _sorted(direct_weekly)
    assert weekly.count() >= 2  # the 12 days span multiple ISO weeks

    # KMV retained-hash state == from-scratch k-min over ALL data.
    from data_lake_medallion_architecture_project_spark.functions.sketches import kmv_hash, kmv_state

    kmv_tbl = TxnTable(f"{state_root}/kmv_day_hashes").read(spark)
    direct_kmv = kmv_state(
        full.select("status", day, kmv_hash("user_id").alias("h")),
        ["status", "day"],
    )
    assert _sorted(kmv_tbl.select("status", "day", "h")) == _sorted(direct_kmv)

    q_state = quantiles_from_state(
        spark, TxnTable(f"{state_root}/dd_day_buckets"), "status"
    )
    q_direct = dd_quantiles(direct_bks.drop("day"), ["status"])
    assert _sorted(q_state) == _sorted(q_direct)

    # Sanity: the estimates are near the exact answers (sketch guarantees).
    exact = {
        r["week"]: r["n"]
        for r in full.groupBy(F.weekofyear(F.to_date("ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in weekly.collect():
        assert abs(r["est_weekly_users"] - exact[r["week"]]) <= 0.2 * exact[r["week"]]


def test_sketch_fold_crash_replay_exactly_once(spark, tmp_path):
    """Crash between the state merges and the stream checkpoint commit:
    deleting the checkpoint's commit marker forces the micro-batch to
    re-run, and the (app_id, batch_id) txn markers must skip BOTH folds —
    critical for the additive DD state, where a replayed add would
    double-count — with the folds reporting 0 partitions touched."""
    import os

    src = str(tmp_path / "events")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _events(spark, 1, 4).write.mode("append").parquet(src)
    run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value"
    )
    hll = TxnTable(f"{state_root}/hll_day_registers")
    dd = TxnTable(f"{state_root}/dd_day_buckets")
    v_hll, v_dd = hll.snapshot().version, dd.snapshot().version
    dd_before = _sorted(dd.read(spark))

    commits = os.path.join(ckpt, "sketch_gold", "commits")
    latest = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    touched = run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value"
    )
    # The batch re-ran, but the table layer skipped both merges.
    assert touched == {"hll_day_registers": 0, "dd_day_buckets": 0}
    assert hll.snapshot().version == v_hll
    assert dd.snapshot().version == v_dd
    assert _sorted(dd.read(spark)) == dd_before  # counts not doubled


def test_dd_fold_rejects_non_positive_values(spark, tmp_path):
    """Zero/negative values are outside the DDSketch domain (ln undefined):
    the fold must drop them at the boundary rather than committing NULL
    buckets into the additive, non-invertible state."""
    from data_lake_medallion_architecture_project_spark.streaming.sketch_refresh import (
        fold_dd_state,
    )

    dd = TxnTable(str(tmp_path / "dd"))
    batch = spark.createDataFrame(
        [
            (datetime(2024, 3, 1, 8, 0, 0), "A", 10.0),
            (datetime(2024, 3, 1, 9, 0, 0), "A", 0.0),
            (datetime(2024, 3, 1, 10, 0, 0), "A", -5.0),
            (datetime(2024, 3, 1, 11, 0, 0), "B", 2.5),
        ],
        ["ts", "status", "value"],
    )
    fold_dd_state(
        spark, dd, batch, "status", "ts", "value", app_id="t", batch_id=0
    )
    rows = dd.read(spark).collect()
    assert all(r["bucket"] is not None for r in rows)
    # Only the two positive-value rows were folded.
    assert sum(r["c"] for r in rows) == 2


def test_sketch_fold_idempotent_without_new_files(spark, tmp_path):
    src = str(tmp_path / "events")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _events(spark, 1, 3).write.mode("append").parquet(src)
    run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value"
    )
    hll = TxnTable(f"{state_root}/hll_day_registers")
    dd = TxnTable(f"{state_root}/dd_day_buckets")
    v_hll, v_dd = hll.snapshot().version, dd.snapshot().version
    before = _sorted(dd.read(spark))

    # Replay with no new files: no new commits, identical state (the DD fold
    # ADDS counts, so a non-idempotent replay would double them).
    run_sketch_gold_refresh(
        spark, src, state_root, ckpt, group_col="status", value_col="value"
    )
    assert hll.snapshot().version == v_hll
    assert dd.snapshot().version == v_dd
    assert _sorted(dd.read(spark)) == before


def test_kmv_fold_equals_direct_and_evicts(spark, tmp_path):
    """Folding two batches (the second re-touching an existing day with new
    users) must leave EXACTLY the same retained-hash state as sketching the
    full corpus from scratch — including EVICTION: a new smaller hash must
    push the old k-th minimum out of the stored partition, not accrete
    beside it. The rollup estimate must match the direct estimate exactly."""
    from data_lake_medallion_architecture_project_spark.functions.sketches import (
        KMV_K,
        kmv_hash,
        kmv_state,
        kmv_theta,
    )
    from data_lake_medallion_architecture_project_spark.streaming.sketch_refresh import (
        distinct_est_from_kmv_state,
        fold_kmv_state,
    )

    state = TxnTable(str(tmp_path / "kmv_day_state"))
    b1 = _events(spark, 1, 3)
    # Batch 2 re-touches day 3 with a fresh user population and adds day 4.
    b2 = _events(spark, 3, 4).withColumn(
        "user_id", F.concat(F.lit("new_"), F.col("user_id"))
    )
    n1 = fold_kmv_state(spark, state, b1, "status", "ts", "user_id", "app", 1)
    n2 = fold_kmv_state(spark, state, b2, "status", "ts", "user_id", "app", 2)
    assert n1 == 3 and n2 == 2
    # Replay of batch 2 must no-op.
    assert fold_kmv_state(spark, state, b2, "status", "ts", "user_id", "app", 2) == 0

    full = b1.unionByName(b2)
    direct = kmv_state(
        full.select(
            "status",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            kmv_hash("user_id").alias("h"),
        ),
        ["status", "day"],
    )
    stored = state.read(spark).select("status", "day", "h")
    assert stored.exceptAll(direct).count() == 0
    assert direct.exceptAll(stored).count() == 0
    # Per-(group, day) the partition holds at most k rows (eviction worked).
    maxn = (
        stored.groupBy("status", "day")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert maxn <= KMV_K

    est_state = {
        r["status"]: r["est_distinct"]
        for r in distinct_est_from_kmv_state(spark, state, "status").collect()
    }
    merged_direct = kmv_state(
        full.select("status", kmv_hash("user_id").alias("h")), ["status"]
    )
    est_direct = {
        r["status"]: r["est"]
        for r in kmv_theta(merged_direct, ["status"]).collect()
    }
    assert est_state == est_direct


def test_cms_fold_equals_direct_and_estimates_bound(spark, tmp_path):
    """Folding two batches must leave exactly the from-scratch cell state
    (cell addition is commutative; replay no-ops), and the state-only
    estimates must be valid CMS upper bounds that are EXACT for keys with
    no hash collisions in some row."""
    from data_lake_medallion_architecture_project_spark.functions.sketches import cms_cells
    from data_lake_medallion_architecture_project_spark.streaming.sketch_refresh import (
        cms_estimates_from_state,
        fold_cms_state,
    )

    state = TxnTable(str(tmp_path / "cms_day_state"))
    b1, b2 = _events(spark, 1, 3), _events(spark, 3, 5)
    assert fold_cms_state(spark, state, b1, "ts", "user_id", "app", 1) == 3
    assert fold_cms_state(spark, state, b2, "ts", "user_id", "app", 2) == 3
    assert fold_cms_state(spark, state, b2, "ts", "user_id", "app", 2) == 0

    full = b1.unionByName(b2)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    direct = cms_cells(full.select(day, "user_id"), "user_id", ["day"])
    stored = TxnTable(str(tmp_path / "cms_day_state")).read(spark)
    assert _sorted(stored.select("day", "j", "bucket", "c")) == _sorted(direct)

    truth = {
        r["user_id"]: r["n"]
        for r in full.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    keys = full.select("user_id").distinct()
    est = {
        r["user_id"]: r["est_count"]
        for r in cms_estimates_from_state(spark, state, keys, "user_id").collect()
    }
    assert all(est[k] >= truth[k] for k in truth)  # upper bound, always
    assert sum(1 for k in truth if est[k] == truth[k]) > 0  # and often tight
