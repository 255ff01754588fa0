"""Unit tests for plans/advanced.py and operators/components.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.components import connected_components
from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

from tests.conftest import SF_SMALL


def test_connected_components_known_graph(spark):
    # Two components: {1,2,3,4} (a chain, diameter 3) and {10, 11};
    # vertex 99 appears in no edge and must be absent from the output.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["s", "d"]
    )
    got = {
        r["id"]: r["comp"]
        for r in connected_components(edges, "s", "d").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_single_clique(spark):
    edges = spark.createDataFrame(
        [(a, b) for a in range(5, 10) for b in range(5, 10) if a < b], ["s", "d"]
    )
    comps = connected_components(edges, "s", "d").select("comp").distinct().collect()
    assert [r["comp"] for r in comps] == [5]


def test_gapfill_zero_days_and_coverage(spark):
    out = REGISTRY["daily_orders_gapfilled"].build(spark, SF_SMALL)
    rows = out.collect()
    # Calendar-dense: one row per day in [min, max], no holes.
    assert len(rows) == 2405
    n_zero = sum(1 for r in rows if r["n_orders"] == 0)
    assert n_zero > 0  # the gap-fill is non-vacuous on this data
    total = sum(r["n_orders"] for r in rows)
    n_orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    )
    assert total == n_orders  # densification adds days, never rows


def test_unpivot_round_trip_totals(spark):
    out = REGISTRY["lineitem_metric_unpivot"].build(spark, SF_SMALL)
    per_metric = {
        r["metric"]: r["n"]
        for r in out.groupBy("metric").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 25 == 0)
        .count()
    )
    assert per_metric == {
        "l_quantity": base,
        "l_extendedprice": base,
        "l_discount": base,
        "l_tax": base,
    }


def test_near_dup_clusters_match_pairs(spark):
    # Every doc in a ≥0.8-shingle-Jaccard pair must share a cluster with its
    # partner, and cluster ids must be the component minimum.
    from data_lake_medallion_architecture_project_spark.operators.dedup import shingle_jaccard_pairs
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=3).collect()
    assert pairs  # non-vacuous on the test corpus
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["near_dup_clusters"].build(spark, SF_SMALL).collect()
    }
    for p in pairs:
        assert clusters[p["id_a"]] == clusters[p["id_b"]]
    for doc_id, cid in clusters.items():
        assert cid <= doc_id


def test_rank_buckets_tolerance_vs_exact(spark):
    """The sketch-based rank path must track the exact single-task-per-stratum
    ranks within the histogram's error bound (the heaviest bucket's mass
    fraction per stratum), and agree exactly on bucket-boundary ordering."""
    exact = REGISTRY["order_price_ranks"].build(spark, SF_SMALL)
    approx = REGISTRY["order_price_rank_buckets"].build(spark, SF_SMALL)
    joined = (
        exact.select("o_orderkey", "o_orderstatus", "pct_rank")
        .join(approx, ["o_orderkey", "o_orderstatus"])
        .select(
            "o_orderstatus",
            "price_bucket",
            (F.abs(F.col("pct_rank") - F.col("approx_pct_rank"))).alias("err"),
        )
    )
    # Error bound: within a bucket every row is assigned the rank of the
    # bucket's first row, so |err| < heaviest bucket mass / stratum size.
    worst = joined.agg(F.max("err")).first()[0]
    assert worst is not None and worst < 0.06, worst
    # Monotonicity: approx rank never decreases as the bucket id grows.
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("price_bucket")
    mono = (
        approx.select("o_orderstatus", "price_bucket", "approx_pct_rank")
        .distinct()
        .withColumn("prev", F.lag("approx_pct_rank").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("approx_pct_rank") < F.col("prev")))
        .count()
    )
    assert mono == 0


def test_pack_documents_shard_count_invariance(spark):
    """Changing n_shards re-buckets docs but must not change how any given
    shard's ordered doc list packs: pack_id must equal a Python-computed
    exclusive prefix sum over (shard, doc_id) order, for several shard
    counts, and the default must follow defaultParallelism."""
    from data_lake_medallion_architecture_project_spark.plans.training import (
        _PACK_BUDGET,
        pack_documents,
    )
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    for n_shards in (1, 5, 8):
        rows = sorted(
            map(tuple, pack_documents(docs, n_shards=n_shards).collect())
        )
        assert {r[2] for r in rows} <= set(range(n_shards))
        cum: dict = {}
        for doc_id, n_tokens, shard, pack_id in sorted(rows, key=lambda r: (r[2], r[0])):
            before = cum.get(shard, 0)
            assert pack_id == before // _PACK_BUDGET, (n_shards, doc_id)
            cum[shard] = before + n_tokens
    # Default shard count tracks the cluster's parallelism.
    default = pack_documents(docs)
    n_default = spark.sparkContext.defaultParallelism
    assert default.agg(F.max("shard")).first()[0] < n_default


def test_runtime_bloom_filter_injects_at_production_scan_sizes(spark):
    """At 100 TB, Catalyst's runtime bloom-filter injection prunes the fact
    scan of a selective fact⋈fact join before the shuffle. The feature is
    size-gated (application side must scan ≥ 10 GB by default), so at bench
    SF it correctly stays off; lowering the gates proves the plan SHAPES
    produced here are bloom-compatible — the declarative plan picks up the
    optimization at production sizes with no code change."""
    from data_lake_medallion_architecture_project_spark.plans import REGISTRY

    pairs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    prev = {k: spark.conf.get(k) for k in pairs}
    try:
        for k, v in pairs.items():
            spark.conf.set(k, v)
        df = REGISTRY["priority_shipment_counts"].build(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bloom_prefilter_no_false_negatives(spark):
    """The Bloom guarantee: every true match survives the prefilter —
    n_true_matches must equal the plain semi-join count — and the false-
    positive sliver stays near the fill^k expectation."""
    row = REGISTRY["bloom_prefilter_orders"].build(spark, SF_SMALL).collect()[0]
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    exact = (
        orders.join(
            customer.filter(F.col("c_mktsegment") == "AUTOMOBILE"),
            orders.o_custkey == customer.c_custkey,
            "left_semi",
        ).count()
    )
    assert row["n_true_matches"] == exact
    assert row["n_candidates"] == row["n_true_matches"] + row["n_false_positives"]
    # fp rate over the non-matching population: generous 5% ceiling (the
    # fill^3 expectation at gate scales is well under 1%).
    non_match = row["n_orders"] - row["n_true_matches"]
    if non_match:
        assert row["n_false_positives"] / non_match <= 0.05


def test_incremental_dedup_bloom_matches_exact_classifier(spark):
    """No false negatives through the Bloom stage: the set of documents the
    Bloom path verifies as dup_of_corpus must EQUAL the exact classifier's,
    and everything else (kept / kept_bloom_fp) must be exactly the exact
    path's non-corpus-dup set."""
    bloom = {
        r["doc_id"]: r["status"]
        for r in REGISTRY["incremental_dedup_bloom"].build(spark, SF_SMALL).collect()
    }
    exact = {
        r["doc_id"]: r["status"]
        for r in REGISTRY["incremental_dedup_new_batch"]
        .build(spark, SF_SMALL)
        .collect()
    }
    assert set(bloom) == set(exact)  # same batch
    bloom_dups = {d for d, s in bloom.items() if s == "dup_of_corpus"}
    exact_dups = {d for d, s in exact.items() if s == "dup_of_corpus"}
    assert bloom_dups == exact_dups
    # every non-candidate ('kept') is genuinely clean in the exact path too
    for d, s in bloom.items():
        if s in ("kept", "kept_bloom_fp"):
            assert exact[d] != "dup_of_corpus"


def test_bloom_width_parameter(spark):
    """A wider filter keeps the no-false-negative guarantee and rejects at
    least as hard as the default width on the same keyset."""
    from data_lake_medallion_architecture_project_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.range(0, 50).withColumnRenamed("id", "k")
    probe = spark.range(0, 5000).withColumnRenamed("id", "k")
    for hx in (4, 6):
        bloom = bloom_build(keys, "k", hex_digits=hx)
        kept = {r["k"] for r in bloom_probe(probe, "k", bloom, hex_digits=hx).collect()}
        assert set(range(50)) <= kept          # every true key survives
        if hx == 6:
            assert len(kept) <= len(kept4)     # wider never rejects less
        else:
            kept4 = kept


def test_integer_pagerank_uniform_cycle(spark):
    """On a regular graph (every node same degree, symmetric) PageRank is
    the uniform distribution, and the integer arithmetic preserves it
    EXACTLY: contrib = 10^6 div 2 = 500000, sum = 10^6, damped =
    150000 + 850000 — no truncation loss, every iteration a fixed point."""
    from data_lake_medallion_architecture_project_spark.operators.components import integer_pagerank

    n = 6  # 6-cycle, symmetrized: deg 2 everywhere
    e = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    out = {r["src"]: r["pr"] for r in integer_pagerank(edges, iters=4).collect()}
    assert out == {i: 1_000_000 for i in range(n)}


def test_integer_pagerank_star_ranks_hub_highest(spark):
    """A star (hub <-> 4 leaves): the hub must outrank every leaf, ranks
    are deterministic longs, and every rank >= the damping base."""
    from data_lake_medallion_architecture_project_spark.operators.components import integer_pagerank

    e = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    out = {r["src"]: r["pr"] for r in integer_pagerank(edges, iters=3).collect()}
    assert out[0] > max(out[i] for i in range(1, 5))
    assert all(v >= 150_000 for v in out.values())
    # leaves are symmetric -> identical ranks
    assert len({out[i] for i in range(1, 5)}) == 1


def test_pagerank_registry_invariants(spark):
    from data_lake_medallion_architecture_project_spark.plans.advanced import PR_BASE, PR_TOP

    rows = REGISTRY["part_copurchase_pagerank"].build(spark, SF_SMALL).collect()
    assert len(rows) == PR_TOP
    prs = [r["pagerank_micro"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(r["pagerank_micro"] >= PR_BASE for r in rows)
    assert all(r["degree"] >= 1 for r in rows)


def test_skyline_is_exact_pareto_frontier(spark):
    """The registry skyline must equal the brute-force O(n^2) Pareto
    frontier over the collected (price, volume) point set, and obey the
    frontier law: sorted by ascending price, volume strictly increases."""
    out = (
        REGISTRY["part_price_volume_skyline"]
        .build(spark, SF_SMALL)
        .orderBy("retail_price_cents")
        .collect()
    )
    assert len(out) > 0
    vols = [r["total_qty_c100"] for r in out]
    assert vols == sorted(vols) and len(set(vols)) == len(vols)

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    vol = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("v")
    )
    pts = {
        (r["price_c"], r["v"])
        for r in vol.join(part, vol.l_partkey == part.p_partkey)
        .select(
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
            "v",
        )
        .distinct()
        .collect()
    }
    brute = {
        (p, v)
        for (p, v) in pts
        if not any(
            (p2 <= p and v2 >= v and (p2 < p or v2 > v)) for (p2, v2) in pts
        )
    }
    assert {(r["retail_price_cents"], r["total_qty_c100"]) for r in out} == brute


def test_ewma_constant_series_is_fixed_point(spark):
    """Dyadic-weight EWMA contract: on a constant series the renormalized
    average equals the constant EXACTLY at every row (the denominator is
    built to match the truncated weight sum), and on the real corpus the
    smoothed value always lies within the window's min/max envelope."""
    from data_lake_medallion_architecture_project_spark.plans.temporal import EWMA_LAGS

    rows = (
        REGISTRY["priority_revenue_ewma"]
        .build(spark, SF_SMALL)
        .orderBy("prio", "day")
        .collect()
    )
    assert len(rows) > 0
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r["prio"], []).append(r)
    for series in by_prio.values():
        cents = [r["revenue_cents"] for r in series]
        for i, r in enumerate(series):
            window = cents[max(0, i - EWMA_LAGS + 1) : i + 1]
            assert min(window) <= r["ewma_cents"] <= max(window)

    # Constant-series fixed point, exact.
    const = spark.createDataFrame(
        [("1996-01-%02d" % d, 500.00) for d in range(1, 25)],
        ["o_orderdate", "o_totalprice"],
    ).selectExpr(
        "'X' AS o_orderpriority",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        const.write.parquet(os.path.join(td, "orders.parquet"))
        out = REGISTRY["priority_revenue_ewma"].build(spark, td).collect()
        assert len(out) == 24
        assert all(r["ewma_cents"] == 50000.0 for r in out)


def _orders_dir(spark, tmpdir, rows):
    """Write a minimal orders.parquet (prio, date, price) for registry runs."""
    import os

    df = spark.createDataFrame(
        rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    df.write.parquet(os.path.join(tmpdir, "orders.parquet"))
    return tmpdir


def test_mad_anomalies_flags_planted_outliers(spark):
    """19 orders near $100 plus one $10,000 outlier: the modified z-score
    must flag exactly the plant; a symmetric tight cluster flags nothing."""
    import tempfile

    rows = [("X", "1996-01-%02d" % (i % 28 + 1), 100.0 + (i % 5)) for i in range(19)]
    rows.append(("X", "1996-02-01", 10000.0))
    rows += [("Y", "1996-01-%02d" % (i % 28 + 1), 200.0) for i in range(10)]
    with tempfile.TemporaryDirectory() as td:
        out = {
            r["prio"]: r
            for r in REGISTRY["priority_order_anomalies"]
            .build(spark, _orders_dir(spark, td, rows))
            .collect()
        }
    assert out["X"]["n_anomalies"] == 1
    assert out["X"]["max_anomaly_cents"] == 1_000_000
    assert out["Y"]["n_anomalies"] == 0 and out["Y"]["max_anomaly_cents"] == 0
    # med2 is 2x the median: X's sorted middle pair is (102, 102).
    assert out["X"]["med2_cents"] == 2 * 10200


def test_trendline_recovers_exact_line(spark):
    """Daily revenue on an exact line y = 500 + 3x cents: slope must be
    exactly 3.0 cents/day and R^2 exactly 1.0 (integer moments, one final
    division with a zero-residual numerator identity)."""
    import tempfile

    rows = [
        ("X", "1996-01-%02d" % (d + 1), (500 + 3 * d) / 100.0) for d in range(20)
    ]
    with tempfile.TemporaryDirectory() as td:
        out = (
            REGISTRY["priority_revenue_trendline"]
            .build(spark, _orders_dir(spark, td, rows))
            .collect()
        )
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 20
    assert r["slope_cents_per_day"] == 3.0
    assert r["r_squared"] == 1.0


def test_association_rules_measures_reconcile(spark):
    """Rule measures must reconcile with their integer anchors exactly, and
    a planted always-together pair must surface with confidence 1.0 from
    both directions and lift = n_orders / n_a."""
    rows = (
        REGISTRY["part_association_rules"].build(spark, SF_SMALL).collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 1 <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["support"] == r["n_ab"] / r["n_orders"]
        assert r["conf_a_to_b"] == r["n_ab"] / r["n_a"]
        assert r["conf_b_to_a"] == r["n_ab"] / r["n_b"]
        assert r["lift"] == (r["n_ab"] * r["n_orders"]) / (r["n_a"] * r["n_b"])

    import tempfile, os

    # 30 baskets; parts 1 and 2 ALWAYS co-occur (10 times); part 3 everywhere.
    li = [(ok, 1) for ok in range(10)] + [(ok, 2) for ok in range(10)]
    li += [(ok, 3) for ok in range(30)] + [(ok, 100 + ok) for ok in range(30)]
    df = spark.createDataFrame(li, ["l_orderkey", "l_partkey"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "lineitem.parquet"))
        out = {
            (r["part_a"], r["part_b"]): r
            for r in REGISTRY["part_association_rules"].build(spark, td).collect()
        }
    r12 = out[(1, 2)]
    assert r12["n_ab"] == 10 and r12["conf_a_to_b"] == 1.0 and r12["conf_b_to_a"] == 1.0
    assert r12["lift"] == 3.0  # 10*30/(10*10)
    r13 = out[(1, 3)]
    assert r13["conf_a_to_b"] == 1.0 and r13["lift"] == 1.0  # 3 is independent-ish


def test_cusum_alerts_match_textbook_recursion(spark):
    """Planted upward shift: 30 in-control days at $1.00/day then 10 days at
    $4.00/day. The window-identity alarms must equal replaying the textbook
    recursion S_t = max(0, S_{t-1} + x_t - k) day by day — same days, same
    S values — and the in-control prefix must never alarm."""
    import tempfile, os

    days = [100] * 30 + [400] * 10  # cents per day
    rows = [
        ("X", "1996-%02d-%02d" % (1 + d // 28, 1 + d % 28), c / 100.0)
        for d, c in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "orders.parquet"))
        out = {
            r["day"]: r["cusum_cents"]
            for r in REGISTRY["revenue_cusum_alerts"].build(spark, td).collect()
        }

    total = sum(days)
    k = (5 * total) // (4 * len(days))
    s_val, expect = 0, {}
    for d, c in enumerate(days):
        s_val = max(0, s_val + c - k)
        if s_val > 4 * k:
            expect["1996-%02d-%02d" % (1 + d // 28, 1 + d % 28)] = s_val
    assert len(expect) > 0  # the plant must actually alarm
    assert out == expect
    assert min(expect) > "1996-02-02"  # nothing before the shift


def test_chi2_drift_detects_planted_shift(spark):
    """An identical mix in both periods gives X^2 = 0 exactly (O = E
    cell-for-cell); a planted flip of the mix produces a large X^2 and the
    contributions reconcile with a numpy replication."""
    import tempfile, os

    def write(rows, td):
        df = spark.createDataFrame(
            rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        df.write.parquet(os.path.join(td, "orders.parquet"))
        return td

    same = [("A", "1996-01-01", 1.0)] * 40 + [("B", "1996-01-01", 1.0)] * 60
    same += [("A", "1999-01-01", 1.0)] * 40 + [("B", "1999-01-01", 1.0)] * 60
    with tempfile.TemporaryDirectory() as td:
        out = REGISTRY["priority_mix_drift"].build(spark, write(same, td)).collect()
    assert all(r["chi2_contrib"] == 0.0 and r["chi2_total"] == 0.0 for r in out)

    flip = [("A", "1996-01-01", 1.0)] * 80 + [("B", "1996-01-01", 1.0)] * 20
    flip += [("A", "1999-01-01", 1.0)] * 20 + [("B", "1999-01-01", 1.0)] * 80
    with tempfile.TemporaryDirectory() as td:
        out = {r["o_orderpriority"] if "o_orderpriority" in r else r["prio"]: r
               for r in REGISTRY["priority_mix_drift"].build(spark, write(flip, td)).collect()}
    # E = 50 everywhere; each cell contributes (30^2)/50 = 18 -> per-prio 36.
    assert out["A"]["chi2_contrib"] == 36.0 and out["B"]["chi2_contrib"] == 36.0
    assert out["A"]["chi2_total"] == 72.0


def test_leakage_free_split_never_splits_a_cluster(spark):
    """The defining property: every near-dup cluster lands wholly in ONE
    split (md5 of the cluster id, not the doc id), and the three splits
    partition the corpus."""
    from data_lake_medallion_architecture_project_spark.operators.components import connected_components
    from data_lake_medallion_architecture_project_spark.operators.dedup import shingle_jaccard_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=3)
    comp = connected_components(pairs, "id_a", "id_b")
    cl = docs.select("doc_id").join(comp, docs["doc_id"] == comp["id"], "left").select(
        "doc_id", F.coalesce("comp", "doc_id").cast("long").alias("cluster_id")
    )
    bucket = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    assigned = cl.select(
        "cluster_id",
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test").alias("split"),
    )
    spans = (
        assigned.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    out = {r["split"]: r for r in REGISTRY["leakage_free_split_summary"].build(spark, SF_SMALL).collect()}
    assert set(out) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out.values()) == docs.count()
    # Cluster-level split => multi-doc clusters shift counts vs doc-level.
    assert all(r["n_clusters"] <= r["n_docs"] for r in out.values())


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus built with freq(i) = floor(2000/i) must fit slope ~ -1 with
    near-perfect R^2; the registry corpus (flat synthetic vocab) must emit
    exactly one row with a well-defined slope either way."""
    import tempfile, os

    words = []
    for i in range(1, 201):
        words += [f"w{i}"] * (2000 // i)
    text = " ".join(words)
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame([(0, text)], ["doc_id", "text"]).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        row = REGISTRY["token_zipf_fit"].build(spark, td).collect()[0]
    assert row["n_tokens_used"] == 200
    assert abs(row["zipf_slope"] + 1.0) < 0.05
    assert row["r_squared"] > 0.99

    out = REGISTRY["token_zipf_fit"].build(spark, SF_SMALL).collect()
    assert len(out) == 1 and out[0]["n_tokens_used"] >= 2


def test_gini_known_distributions(spark):
    """Gini contract on planted distributions: perfectly equal revenue gives
    exactly 0; an extreme one-customer concentration approaches 1−1/n; and
    every registry value sits in [0, 1)."""
    import tempfile, os

    def run(rows):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(ok, ck, p) for ok, ck, p in rows],
                ["o_orderkey", "o_custkey", "o_totalprice"],
            ).write.parquet(os.path.join(td, "orders.parquet"))
            spark.createDataFrame(
                [(ck, "SEG") for ck in {r[1] for r in rows}],
                ["c_custkey", "c_mktsegment"],
            ).write.parquet(os.path.join(td, "customer.parquet"))
            return REGISTRY["segment_revenue_gini"].build(spark, td).collect()[0]

    equal = run([(i, i, 10.0) for i in range(10)])
    assert equal["gini"] == 0.0
    # one customer holds ~everything: G -> (n-1)/n · (1 - eps)
    skew = run([(i, i, 0.01) for i in range(9)] + [(9, 9, 10000.0)])
    assert skew["gini"] > 0.85

    rows = REGISTRY["segment_revenue_gini"].build(spark, SF_SMALL).collect()
    assert all(0.0 <= r["gini"] < 1.0 for r in rows)


def test_entropy_known_mixes(spark):
    """Entropy contract: a single-type user scores exactly 0; a perfectly
    uniform two-type user scores ln 2 (to lattice precision); registry
    values stay within [0, ln 5] for the five event types."""
    import math
    import tempfile, os
    from datetime import datetime

    rows = [(datetime(2024, 1, 1, 0, i), 1, "click", 0.0, "{}") for i in range(8)]
    rows += [
        (datetime(2024, 1, 1, 1, i), 2, ("view" if i % 2 else "click"), 0.0, "{}")
        for i in range(8)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, ["ts", "user_id", "event_type", "value", "props"]
        ).write.parquet(os.path.join(td, "events.parquet"))
        out = {
            r["user_id"]: r
            for r in REGISTRY["user_event_entropy"].build(spark, td).collect()
        }
    # Zero up to the 1e-9 ln-lattice quantization residue.
    assert abs(out[1]["entropy"]) < 2e-9 and out[1]["n_types"] == 1
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-8

    rows = REGISTRY["user_event_entropy"].build(spark, SF_SMALL).collect()
    assert all(-2e-9 <= r["entropy"] <= math.log(5) + 2e-9 for r in rows)


def test_apriori_pruning_is_lossless(spark):
    """Downward closure: mining with the frequent-item prefilter must equal
    mining unpruned, pair for pair (the registry oracle checks this cross-
    engine; here the same property is pinned in-engine on a planted corpus
    where a RARE item pairs twice with a frequent one... which is impossible
    — support(pair) <= support(item) — so the planted rare pair must NOT
    surface, while the frequent pair must)."""
    import tempfile, os

    li = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 99)]
    # items: 10 x3, 11 x2 (frequent); 99 x1 (rare) -> pair (10,99) support 1.
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(li, ["l_orderkey", "l_partkey"]).write.parquet(
            os.path.join(td, "lineitem.parquet")
        )
        out = {
            (r["part_a"], r["part_b"]): r["support"]
            for r in REGISTRY["part_pairs_apriori"].build(spark, td).collect()
        }
    assert out == {(10, 11): 2}


def test_ranksum_matches_scipy_free_reference(spark):
    """U and AUC contract on planted data: disjoint supports give AUC
    exactly 1 (every F above every O); identical distributions give AUC
    exactly 0.5 (tie-averaged doubled ranks make this exact in ℤ)."""
    import tempfile, os

    def run(rows):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, ["o_orderkey", "o_orderstatus", "o_totalprice"]
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["status_price_ranksum"].build(spark, td).collect()[0]

    sep = [(i, "O", 1.0 + i) for i in range(5)] + [
        (10 + i, "F", 100.0 + i) for i in range(7)
    ]
    r = run(sep)
    assert (r["n_f"], r["n_o"]) == (7, 5)
    assert r["auc_f_gt_o"] == 1.0 and r["u2_f"] == 2 * 7 * 5

    same = [(i, "O", 5.0) for i in range(4)] + [(10 + i, "F", 5.0) for i in range(4)]
    r = run(same)
    assert r["auc_f_gt_o"] == 0.5


def test_ks_known_distributions(spark):
    """KS contract: disjoint supports give D exactly 1; identical samples
    give D exactly 0; and D always bounds the rank-sum AUC displacement
    (D >= |2*AUC - 1| is NOT generally true, so we assert only the
    definitional bounds 0 <= D <= 1 on the corpus)."""
    import tempfile, os

    def run(rows):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, ["o_orderkey", "o_orderstatus", "o_totalprice"]
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["status_price_ks"].build(spark, td).collect()[0]

    sep = [(i, "O", 1.0 + i) for i in range(5)] + [
        (10 + i, "F", 100.0 + i) for i in range(7)
    ]
    assert run(sep)["ks_d"] == 1.0
    same = [(i, "O", float(i % 3)) for i in range(9)] + [
        (10 + i, "F", float(i % 3)) for i in range(9)
    ]
    assert run(same)["ks_d"] == 0.0
    corpus = REGISTRY["status_price_ks"].build(spark, SF_SMALL).collect()[0]
    assert 0.0 <= corpus["ks_d"] <= 1.0


def test_benford_on_planted_conforming_data(spark):
    """A corpus whose leading digits are drawn exactly at Benford frequencies
    must score a tiny chi2; uniform leading digits must score large; and
    expected counts always sum to n."""
    import math
    import tempfile, os

    def run(prices):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(i, p) for i, p in enumerate(prices)],
                ["o_orderkey", "o_totalprice"],
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["price_benford_deviation"].build(spark, td).collect()

    n = 10000
    benford = []
    for d in range(1, 10):
        benford += [float(d)] * round(n * math.log10(1 + 1 / d))
    rows = run(benford)
    assert rows[0]["chi2_total"] < 1.0  # draws AT the law: only rounding noise
    assert abs(sum(r["expected"] for r in rows) - len(benford)) < 1e-6

    uniform = [float(d) for d in range(1, 10)] * 1000
    rows = run(uniform)
    assert rows[0]["chi2_total"] > 100.0


def test_anova_planted_effects(spark):
    """ANOVA contract: groups with identical means give F ~ 0; a strong
    planted weekday effect gives a large F (cross-checked against a direct
    numpy computation of the same formula)."""
    import numpy as np
    import tempfile, os

    def run(rows):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, ["o_orderdate", "o_totalprice"]
            ).withColumn(
                "o_orderdate", F.col("o_orderdate").cast("timestamp")
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["weekday_revenue_anova"].build(spark, td).collect()[0]

    # 1996-01-01 was a Monday; days 1..14 cover two full weeks.
    flat = [("1996-01-%02d" % d, 100.0 + (d % 2)) for d in range(1, 15)]
    r = run(flat)
    assert r["n_groups"] == 7 and r["f_stat"] < 1e-6  # same mean every dow

    # Weekday effect + within-group noise (the week index) so SSW > 0.
    effect = [
        ("1996-01-%02d" % d, (1000.0 if d % 7 == 1 else 100.0) + (d // 7))
        for d in range(1, 29)
    ]
    r = run(effect)
    vals = {}
    for d, p in [(int(x[0][-2:]), x[1]) for x in effect]:
        vals.setdefault((d - 1) % 7, []).append(p * 100)
    groups = [np.array(v) for v in vals.values()]
    allv = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_np = (ssb / (len(groups) - 1)) / (ssw / (len(allv) - len(groups)))
    assert abs(r["f_stat"] - f_np) / f_np < 1e-9
    assert r["f_stat"] > 50


def test_winsorized_mean_caps_leverage(spark):
    """One extreme outlier among uniform values: the raw mean moves, the
    winsorized mean stays at the bulk's value (the outlier clamps to the
    95th-rank value); on clean data the two means agree exactly."""
    import tempfile, os

    def run(prices):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(i, "X", p) for i, p in enumerate(prices)],
                ["o_orderkey", "o_orderpriority", "o_totalprice"],
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["priority_winsorized_mean"].build(spark, td).collect()[0]

    clean = [100.0] * 40
    r = run(clean)
    assert r["raw_mean"] == r["winsorized_mean"] == 100.0

    spiked = [100.0] * 39 + [1_000_000.0]
    r = run(spiked)
    assert r["raw_mean"] > 25000.0
    assert r["winsorized_mean"] == 100.0  # the spike clamps to the bulk


def test_session_paths_shape(spark):
    """Paths are 1-3 event types long, counts are positive and descending,
    and the total path-session count never exceeds the session count."""
    rows = REGISTRY["top_session_paths"].build(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True) and counts[-1] >= 1
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 3
        assert all(s in {"click", "view", "purchase", "signup", "error"} for s in steps)
    n_sessions = (
        REGISTRY["sessionize_events"]
        .build(spark, SF_SMALL)
        .select("user_id", "session_no")
        .distinct()
        .count()
    )
    assert sum(counts) <= n_sessions


def test_pareto_index_known_distributions(spark):
    """Planted concentration: one whale + dust -> k = 1; perfectly equal
    customers -> k = ceil(0.8 n); and k/n reconciles with k."""
    import tempfile, os

    def run(rows):
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, ["o_orderkey", "o_custkey", "o_totalprice"]
            ).write.parquet(os.path.join(td, "orders.parquet"))
            return REGISTRY["customer_revenue_pareto"].build(spark, td).collect()[0]

    whale = [(0, 0, 10000.0)] + [(i, i, 1.0) for i in range(1, 21)]
    r = run(whale)
    assert r["k_for_80pct"] == 1 and r["n_customers"] == 21

    equal = [(i, i, 50.0) for i in range(10)]
    r = run(equal)
    assert r["k_for_80pct"] == 8  # 8/10 of equal customers = exactly 80%
    assert r["top_share_for_80pct"] == 0.8
