"""Deterministic, mergeable sketch primitives — shared by the registry
queries (``plans/sampling.py``) and the incremental Gold maintenance
(``streaming/sketch_refresh.py``).

Two sketch families, both commutative monoids so partial states merge in any
order and any grouping:

* **md5-register HLL** (distinct counts): state = max-rho per (group, bucket),
  merge = element-wise MAX. The register hash is the replayable md5 family
  (``hll_weekly_users_md5``'s oracle recomputes the exact same bits in
  DuckDB), so any engine can verify any rollup of the state.
* **DDSketch** (quantiles, Masson et al. VLDB'19): state = log-γ bucket
  counts, merge = element-wise SUM, ±1% relative value error at any quantile.

The monoid property is the 100 TB design point: a day's state is KBs, so an
incremental Gold refresh folds new days into weekly/monthly rollups by
register-MAX / bucket-SUM without ever rescanning event history — the
aggregate-level fix for the reference's O(history) recompute
(/root/reference/pipeline/silver_to_gold.py:222-229).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------- #
# HLL — md5-register, 256 buckets, exact-integer estimate arithmetic.
# --------------------------------------------------------------------------- #

HLL_M = 256          # registers: bucket = the first two hex digits (8 bits)
HLL_SUFFIX = 62      # rho source: the remaining 62 digits' HIGH bits
HLL_RHO_EMPTY = HLL_SUFFIX + 1   # rho when every suffix bit is low
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # Flajolet et al. bias constant
# alpha·m²·2^63 as one double literal: the whole numerator is a constant, so
# the only runtime float ops are one decimal→double cast and one division —
# both IEEE-correctly-rounded from identical operands in every engine.
HLL_NUM = repr(HLL_ALPHA * HLL_M * HLL_M * 2.0 ** HLL_RHO_EMPTY)
HLL_LINEAR_THRESHOLD = 2.5 * HLL_M


def hll_hash(id_col: str | Column) -> Column:
    """The 64-hex-digit deterministic register hash md5("0|"+id)∥md5("1|"+id)
    — identical digits in any engine with md5()."""
    s = (F.col(id_col) if isinstance(id_col, str) else id_col).cast("string")
    return F.concat(
        F.md5(F.concat(F.lit("0|"), s)), F.md5(F.concat(F.lit("1|"), s))
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], id_col: str | Column
) -> DataFrame:
    """The mergeable HLL state: one (group..., bucket, r) row per non-empty
    register, r = max leading-low-digit run. KB-scale per group."""
    hx = hll_hash(id_col)
    bucket = F.substring(hx, 1, 2)
    rho = (
        F.length(F.regexp_extract(F.substring(hx, 3, HLL_SUFFIX), "^[0-7]*", 0))
        + 1
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], alias: str = "est_users"
) -> DataFrame:
    """Merge register states by MAX onto ``group_cols`` and estimate the
    distinct count per group. Exact-integer register sums (DECIMAL) until one
    IEEE division — the cross-engine-replayable arithmetic proven by
    ``hll_weekly_users_md5``'s hash-green oracle."""
    agg = (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("r"))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.pow(F.lit(2.0), F.lit(HLL_RHO_EMPTY) - F.col("r")).cast(
                    "decimal(38,0)"
                )
            ).alias("s"),
            F.count(F.lit(1)).alias("hit"),
        )
    )
    v = F.lit(HLL_M) - F.col("hit")
    denom = (
        F.col("s")
        # String literal: 2^63 overflows a LongType lit; string→decimal is exact.
        + v.cast("decimal(38,0)")
        * F.lit(str(2 ** HLL_RHO_EMPTY)).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(float(HLL_NUM)) / denom
    est = F.when(
        (raw <= F.lit(HLL_LINEAR_THRESHOLD)) & (v > 0),
        F.lit(HLL_M) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias(alias))


# --------------------------------------------------------------------------- #
# DDSketch — log-γ buckets, ±1% relative error, merge = bucket-wise SUM.
# --------------------------------------------------------------------------- #

DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
DD_LNG = math.log(DD_GAMMA)  # bucket width in log space
DD_QS = (0.5, 0.9, 0.99)


def dd_bucket(value_col: str | Column) -> Column:
    """bucket = ceil(ln(x)/ln γ) — positive values only (DDSketch domain)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.ceil(F.log(c) / F.lit(DD_LNG)).cast("long")


def dd_bucket_counts(
    df: DataFrame, group_cols: list[str], value_col: str | Column
) -> DataFrame:
    """The mergeable DDSketch state: (group..., bucket, c) counts."""
    return df.groupBy(*group_cols, dd_bucket(value_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )


# --------------------------------------------------------------------------- #
# Count-Min Sketch — frequency estimates in fixed memory, merge = cell SUM.
# --------------------------------------------------------------------------- #

CMS_DEPTH = 4    # independent hash rows
CMS_WIDTH = 256  # cells per row: bucket = first two hex digits of md5(j|key)


def cms_cells(
    df: DataFrame, key_col: str | Column, group_cols: list[str] | None = None
) -> DataFrame:
    """The mergeable CMS state: (group..., j, bucket, c) — ≤ depth·width =
    1024 cells per group however many keys stream through. Each input row
    increments one cell per hash row j; map-side partials collapse to cell
    grain before the (KB) shuffle. Merge = cell-wise SUM; estimate(key) =
    MIN over j of cell[j][md5(j|key) bucket] — an upper bound on the true
    count (Cormode & Muthukrishnan 2005). The md5 bucketing is replayable
    in any engine, same family as the HLL/MinHash/SimHash oracles.
    ``group_cols`` (e.g. a day key) makes the state a mergeable time-series
    of sketches — the incremental-Gold shape."""
    g = list(group_cols or [])
    k = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("string")
    rows = df.select(
        *g,
        k.alias("_k"),
        F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"),
    )
    return rows.groupBy(*g, "j", cms_bucket("j", "_k").alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_cells_from_counts(
    counts: DataFrame, key_col: str, count_col: str
) -> DataFrame:
    """CMS cells from a pre-aggregated (key, count) table: cell[j][b] =
    Σ counts of keys hashing to b under row j — IDENTICAL cells to streaming
    every row through ``cms_cells`` (cell addition is commutative), at
    |keys|·depth hashes instead of |rows|·depth. The right batch plan when
    key cardinality ≪ row count (measured 55.6 s → row-count-agg cost at
    100×, the md5 work dominating); ``cms_cells`` remains the
    streaming/ingest shape where no count table exists."""
    rows = counts.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(count_col).alias("_c"),
        F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"),
    )
    return rows.groupBy("j", cms_bucket("j", "_k").alias("bucket")).agg(
        F.sum("_c").alias("c")
    )


def cms_bucket(j_col: str | Column, key_col: str | Column) -> Column:
    """The CMS bucket expression for a (hash-row, key) pair — used to look
    keys up in the cell table with the exact hashing ``cms_cells`` built."""
    j = (F.col(j_col) if isinstance(j_col, str) else j_col).cast("string")
    k = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("string")
    return F.substring(F.md5(F.concat(j, F.lit("|"), k)), 1, 2)


# --------------------------------------------------------------------------- #
# KMV / theta sketch — distinct SET OPERATIONS (intersection, union, Jaccard)
# in fixed memory; merge = union-then-retake-k-smallest.
# --------------------------------------------------------------------------- #

KMV_K = 256       # retained minimum hashes per group
KMV_HEX = 15      # 60-bit hash: fixed-width hex orders exactly like the integer
KMV_SENTINEL = "g"  # lexicographically above every hex digit = "whole space"
KMV_SPACE_D = float(2**60)              # exact: power of two
KMV_NUM_D = float((KMV_K - 1) * 2**60)  # exact: 255·2^60 = 2^68 − 2^60 (8 bits)


def kmv_hash(id_col: str | Column) -> Column:
    """60-bit deterministic hash as the first 15 hex digits of md5("k|"+id) —
    fixed-width lowercase hex, so STRING order ≡ numeric order and any engine
    with md5() replays the identical sample. Numeric conversion happens once
    per GROUP (not per row) at estimate time."""
    s = (F.col(id_col) if isinstance(id_col, str) else id_col).cast("string")
    return F.substring(F.md5(F.concat(F.lit("k|"), s)), 1, KMV_HEX)


def kmv_state(df: DataFrame, group_cols: list[str], k: int = KMV_K,
              salts: int = 8) -> DataFrame:
    """The mergeable KMV state: the k smallest DISTINCT hashes per group,
    from a (group..., h) frame. Monoid: state(A ∪ B) = k-min(state(A) ∪
    state(B)), because the global k-th minimum is always inside some part's
    k minima — so day-grain states fold into weekly/monthly ones without
    rescanning, same contract as the HLL registers.

    Scale shape: DISTINCT collapses to hash grain first; the k-min rank is
    two-phase — rank within (group, salt) keeps ≤ salts·k candidate rows per
    group before the exact per-group rank, so one giant group never funnels
    its whole distinct set through a single sort partition. The result is
    salt-independent (phase 1 only discards rows provably outside the k
    minima)."""
    from pyspark.sql import Window

    d = df.select(*group_cols, "h").distinct()
    w1 = Window.partitionBy(*group_cols, "_s").orderBy("h")
    pre = (
        d.withColumn("_s", F.pmod(F.hash("h"), F.lit(salts)))
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_s", "_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pre.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_theta(states: DataFrame, group_cols: list[str],
              k: int = KMV_K) -> DataFrame:
    """Per-group theta summary from a KMV state: n (retained count), the
    theta threshold as both hex (for replayable < comparisons) and double
    (for the one IEEE division), and the distinct-count estimate.

    Saturated group (n = k): theta = the k-th minimum; retained values < θ
    number k−1; est = (k−1)·2^60/θ (one exact-constant / one rounded-cast
    division — engine-identical). Unsaturated: the state IS the distinct
    set, θ = the whole space, est = n exactly."""
    summ = states.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax")
    )
    sat = F.col("n") == k
    td = F.conv("hmax", 16, 10).cast("long").cast("double")
    return summ.select(
        *group_cols,
        F.when(sat, F.col("hmax")).otherwise(F.lit(KMV_SENTINEL)).alias("thex"),
        F.when(sat, td).otherwise(F.lit(KMV_SPACE_D)).alias("td"),
        F.when(sat, F.lit(KMV_NUM_D) / td)
        .otherwise(F.col("n").cast("double"))
        .alias("est"),
    )


def dd_quantiles(
    buckets: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = DD_QS,
    total_alias: str = "n_orders",
) -> DataFrame:
    """Merge bucket states by SUM onto ``group_cols`` and select quantile
    estimates. Bucket selection is scaled-INTEGER cumulative-count logic
    (100*cum >= q100*total — no float boundary, so every engine picks the
    same bucket); the value estimate 2γᵇ/(γ+1) is one pow per output row.

    One exchange for the whole merge→window→select chain: the input is
    repartitioned on ``group_cols`` up front, which satisfies the merge
    groupBy's (group, bucket) clustering (hash on a key SUBSET co-locates
    the superset), both windows, and the final groupBy — Catalyst inserts
    sorts only. Parallelism = #groups is fine HERE by contract: ``buckets``
    is sketch STATE (groups × ~log-range buckets), never raw rows, so the
    post-repartition stages are KB-scale at any corpus size."""
    from pyspark.sql import Window

    if group_cols:
        buckets = buckets.repartition(*group_cols)
    merged = buckets.groupBy(*group_cols, "bucket").agg(F.sum("c").alias("c"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = merged.select(
        *group_cols,
        "bucket",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )
    sels = [
        F.min(
            F.when(
                F.col("cum") * F.lit(100)
                >= F.lit(int(round(q * 100))) * F.col("total"),
                F.col("bucket"),
            )
        ).alias(f"b{int(q * 100)}")
        for q in qs
    ]
    sel = cum.groupBy(*group_cols).agg(
        F.max("total").cast("long").alias(total_alias), *sels
    )
    ests = [
        (
            F.lit(2.0)
            * F.pow(F.lit(DD_GAMMA), F.col(f"b{int(q * 100)}"))
            / F.lit(DD_GAMMA + 1)
        ).alias(f"p{int(q * 100)}_est")
        for q in qs
    ]
    return sel.select(*group_cols, total_alias, *ests)
