"""Corpus sampling and cross-document segment dedup.

The last pre-training selection stages a 100 TB pipeline runs after quality
filtering and before packing (the reference has no analog — its Gold layer
aggregates rows, ``/root/reference/pipeline/silver_to_gold.py``; these
operate on the training corpus itself):

* ``segment_dedup_docs`` — CCNet-style cross-document segment dedup: split
  every document into fixed 8-word segments, count how many distinct
  documents each segment appears in corpus-wide, and rebuild each document
  keeping only the segments no other document shares (boilerplate headers,
  navigation chrome, and license blocks are exactly the segments that repeat
  across documents). Shuffle discipline: the segment-frequency aggregate
  groups on the segment string itself (exactness — a hash key would trade
  a 2⁻⁶⁴ collision for a wrongly-dropped segment) but only after map-side
  partials collapse within-partition repeats; only the MULTI-document
  segment set flows back (a left join, NULL ⇔ keep) — |duplicated
  segments|, a tiny fraction of the corpus, so AQE broadcasts it at any
  realistic dup rate while the unique majority never joins anything.
* ``doc_split_summary`` — deterministic hash-based train/val/test split.
  The assignment key is ``md5(doc_id)``: stable across runs, engines, and
  cluster sizes (never ``rand()``, which resamples per run and per retry).
  Buckets come from the first two hex chars — an even 256-way partition of
  the hash space — so the expected split is 204/26/26 ≈ 80/10/10 and every
  engine that computes md5 agrees bit-for-bit. Map-only + a 3-group agg.
* ``source_capped_sample`` — per-source document cap (the Common-Crawl
  "no domain may dominate the corpus" rule): keep at most K documents per
  source, chosen by hash order so the sample is deterministic and unbiased
  by ingest order. One shuffle on ``source``; the rank is a bounded
  per-group window. At extreme per-source skew (one domain = half the
  corpus) the window's sort is the cost — the two-phase fix is a
  per-partition pre-cap at K (any partition's global top-K survivors are in
  its local top-K), which composes here as a ``mapInPandas`` pre-filter; at
  TPC-H-like source cardinalities the plain window is the right plan.
* ``daily_user_sketch_rollup`` — re-aggregatable distinct counts: per-day
  HLL sketches (Apache DataSketches via ``hll_sketch_agg``) merged into
  weekly estimates with ``hll_union_agg``. THE pattern for incremental Gold
  maintenance at 100 TB: a refresh folds new days in by sketch union without
  rescanning history, which plain ``approx_count_distinct`` cannot do (its
  estimate is not mergeable across separate aggregations). Estimates are
  approximate by construction → registered rows-only (no DuckDB oracle), and
  the companion pytest bounds the estimate against the exact count.

Cross-engine discipline: md5 hex is lowercase in both Spark and DuckDB;
integer casts of ``doc_id`` render identically; all count aggregates CAST
to BIGINT (DuckDB types integer SUMs as HUGEINT).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register

SEGMENT_WORDS = 8
SOURCE_CAP = 10

# --------------------------------------------------------------------------- #
# CCNet-style cross-document segment dedup.
# --------------------------------------------------------------------------- #

_SEGMENT_DEDUP_ORACLE = f"""
WITH segs AS (
  SELECT d.doc_id, i.i AS seg_idx,
         array_to_string(
           (string_split(d.text, ' '))[i.i*{SEGMENT_WORDS}+1 : i.i*{SEGMENT_WORDS}+{SEGMENT_WORDS}],
           ' ') AS seg
  FROM documents d,
       (SELECT unnest(generate_series(0, 511)) AS i) i
  WHERE i.i * {SEGMENT_WORDS} < len(string_split(d.text, ' '))
),
freq AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS n_docs FROM segs GROUP BY seg
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       -- COALESCE: when every segment is dropped, array_to_string over a
       -- list of NULLs is NULL in DuckDB; Spark's collect_list skips the
       -- NULLs and array_join yields ''.
       COALESCE(array_to_string(
         list(CASE WHEN f.n_docs = 1 THEN s.seg END ORDER BY s.seg_idx), ' '), '')
         AS kept_text
FROM segs s JOIN freq f ON s.seg = f.seg
GROUP BY s.doc_id
"""


@register("segment_dedup_docs", oracle=_SEGMENT_DEDUP_ORACLE, tags=("dedup", "text", "bench"))
def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment dedup (CCNet's line-level dedup with fixed
    8-word segments standing in for lines): every segment that appears in
    more than one document is dropped from all of them, and each document is
    reassembled from its surviving segments in order.

    Plan shape: one exploded projection feeds (a) the corpus-wide segment
    frequency aggregate and (b) the rebuild; the frequency shuffle groups on
    the segment string only after the map-side partial has collapsed
    within-doc repeats, and the rebuild's per-doc regroup carries
    (doc_id, seg_idx, seg, keep) — O(corpus tokens), the unavoidable floor.
    The kept_text contract (not just counts) makes the oracle verify the
    ordering logic, not only the filter.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    n_segs = F.ceil(F.size("w") / F.lit(SEGMENT_WORDS)).cast("int")
    segs = words.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx", "_i"),
        F.col("w"),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice("w", F.col("seg_idx") * SEGMENT_WORDS + 1, SEGMENT_WORDS), " "
        ).alias("seg"),
    )
    # Only the DUPLICATED segments flow back (the unique ones — the vast
    # majority at any realistic dup rate — never join): a left join against
    # the small multi-doc set, NULL ⇔ keep. Joining the full frequency
    # table instead would broadcast |distinct segments| — corpus-scaled.
    multi = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("seg", F.lit(True).alias("_dup"))
    )
    return (
        segs.join(multi, "seg", "left")
        .withColumn("n_docs", F.when(F.col("_dup").isNotNull(), 2).otherwise(1))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("n_docs") == 1,
                                F.struct("seg_idx", "seg"),
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("kept_text"),
        )
    )


# --------------------------------------------------------------------------- #
# Deterministic hash split.
# --------------------------------------------------------------------------- #

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY split
"""


@register("doc_split_summary", oracle=_SPLIT_ORACLE, tags=("sampling",))
def doc_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id):
    the split survives reruns, repartitions, and engine swaps, unlike
    ``rand()``-based sampling (non-deterministic under retry — a retried
    task would resample and double-assign rows). The first hex byte
    partitions the hash space into 256 even cells; 'cc' = 204 cells = 79.7%,
    'e6' − 'cc' = 26 cells = 10.2%. Map-only projection + 3-group agg:
    nothing here shuffles more than 3 rows per partition."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        docs.select(
            "n_chars",
            F.when(bucket < "cc", "train")
            .when(bucket < "e6", "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------- #
# Per-source cap.
# --------------------------------------------------------------------------- #

_SOURCE_CAP_ORACLE = f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents
) WHERE sample_rank <= {SOURCE_CAP}
"""


@register("source_capped_sample", oracle=_SOURCE_CAP_ORACLE, tags=("sampling",))
def source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most SOURCE_CAP documents per source, selected by hash order —
    the anti-domination rule of web-corpus curation. Hash order (not doc_id
    order) means the sample is independent of ingest sequence; the doc_id
    tiebreak makes it total, so both engines pick identical survivors.
    One shuffle on source; the window sort is per-group and the output is
    bounded at K·|sources| rows. See the module docstring for the
    per-partition pre-cap composition if one source dominates the corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SOURCE_CAP)
    )


# --------------------------------------------------------------------------- #
# Guaranteed-recall heavy hitters.
# --------------------------------------------------------------------------- #

FREQ_K = 1000

_FREQ_ORACLE = f"""
WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
tok AS (
  SELECT ws[i.i] || ' ' || ws[i.i+1] AS item
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
),
tot AS (SELECT COUNT(*) AS n_total FROM tok)
SELECT item AS bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM tok GROUP BY item
HAVING COUNT(*) * {FREQ_K} > (SELECT n_total FROM tot)
"""


@register("frequent_bigrams", oracle=_FREQ_ORACLE, tags=("text", "sketch", "bench"))
def frequent_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams with frequency > 1/FREQ_K of the corpus — exact counts
    via the two-phase heavy-hitter operator (``operators/freqitems.py``):
    per-partition bounded-memory candidate generation with a pigeonhole
    no-false-negative guarantee, then an exact broadcast-join recount. The
    oracle is the naive full GROUP BY — hash equality proves the sketchy
    phase lost nothing. At 100 TB the full groupBy shuffles the whole
    vocabulary; this shuffles only candidates."""
    from ..operators.freqitems import frequent_items

    ws = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower("text"), " ").alias("ws")
    )
    bigrams = ws.select(
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("a"),
                F.slice("ws", 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.concat_ws(" ", "p.a", "p.b").alias("bigram"))
    return frequent_items(bigrams, "bigram", FREQ_K).select(
        F.col("item").alias("bigram"), "n"
    )


# --------------------------------------------------------------------------- #
# Mergeable HLL sketch rollup.
# --------------------------------------------------------------------------- #


_SKETCH_ROLLUP_ORACLE = """
WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
daily AS (SELECT day, COUNT(DISTINCT user_id) AS x FROM d GROUP BY day),
wk AS (
  SELECT weekofyear(day) AS week, CAST(SUM(x) AS BIGINT) AS sum_daily_distinct
  FROM daily GROUP BY 1
),
ex AS (
  SELECT weekofyear(day) AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_weekly_users
  FROM d GROUP BY 1
)
SELECT CAST(wk.week AS BIGINT) AS week, ex.exact_weekly_users,
       wk.sum_daily_distinct, TRUE AS est_within_2pct
FROM wk JOIN ex ON wk.week = ex.week
"""


@register(
    "daily_user_sketch_rollup",
    oracle=_SKETCH_ROLLUP_ORACLE,
    tags=("sketch", "streaming"),
)
def daily_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user estimates assembled by MERGING per-day HLL
    sketches (Apache DataSketches), next to the exact counts for audit.

    Why sketches and not approx_count_distinct: a sketch column is
    RE-AGGREGATABLE — an incremental Gold refresh folds a new day into the
    weekly/monthly rollup by sketch union, never rescanning history, and
    region ∪ region composes the same way. approx_count_distinct yields a
    number, not a state, so every rollup regroups raw events. At 100 TB the
    per-day sketch table is KB per group — the only thing the merge stage
    ever shuffles.

    Hash-certified via an INVARIANT oracle (DataSketches estimates aren't
    replayable in DuckDB by design): the output carries the exact weekly
    count, the sum of exact daily counts, and ``est_within_2pct`` —
    |merged-sketch estimate − exact| ≤ 2% · exact in INTEGER arithmetic
    (|Δ|·50 ≤ exact). The oracle recomputes both exact columns and expects
    TRUE, so a hash match certifies the rollup arithmetic and that the
    sketch merge honored its accuracy contract. Not a coin flip: the
    sketch is deterministic given the data; measured max relative error is
    0.0% (sf0.01) / 0.8% (sf0.1). The register-level replayable twin is
    ``hll_weekly_users_md5``."""
    events = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = events.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_daily"),
    )
    weekly = daily.groupBy(F.weekofyear("day").cast("long").alias("week")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("est"),
        F.sum("exact_daily").cast("long").alias("sum_daily_distinct"),
    )
    exact = events.groupBy(
        F.weekofyear("day").cast("long").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_weekly_users"))
    return (
        weekly.join(exact, "week")
        .select(
            "week",
            "exact_weekly_users",
            "sum_daily_distinct",
            (
                F.abs(F.col("est") - F.col("exact_weekly_users")) * 50
                <= F.col("exact_weekly_users")
            ).alias("est_within_2pct"),
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------- #
# Deterministic corpus mixing — per-source downsampling to target weights.
# --------------------------------------------------------------------------- #

# Per-source target keep rates (the training-mix recipe: upweight the clean
# source, downsample the bulk ones). Rates are expressed in 1/256 hex-prefix
# granularity so the decision is a pure string comparison in any engine.
_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT_RATE = 0.125


def _mix_threshold(rate: float) -> str:
    # Three hex chars, zero-padded: rate 1.0 -> '100', which is strictly
    # greater than every '0'-prefixed two-char hash ('000'..'0ff'), so a
    # full-rate source keeps ALL documents. A two-char threshold cannot
    # express 256/256 ('100' is 3 chars and '00'..'ff' compare lexically),
    # which silently decimated rate-1.0 sources to ~6.6% before round 9.
    return format(min(256, int(round(rate * 256))), "03x")


def mix_keep(
    id_col: str, source_col: str, rates: dict[str, float], default_rate: float
) -> F.Column:
    """The deterministic training-mix keep decision as a reusable predicate:
    keep iff '0'+first-two-hex(md5("mix|"+id)) < the source's 3-char
    threshold (1/256 granularity; rate ≥ 1.0 keeps everything). Shared by
    ``corpus_mix_summary`` (where the DuckDB oracle replays it bit-for-bit)
    and the ``trainprep`` front door's --mix stage."""
    h = F.concat(
        F.lit("0"),
        F.substring(
            F.md5(F.concat(F.lit("mix|"), F.col(id_col).cast("string"))), 1, 2
        ),
    )
    thr = F.lit(_mix_threshold(default_rate))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(source_col) == s, F.lit(_mix_threshold(r))).otherwise(thr)
    return h < thr


def _mix_oracle() -> str:
    whens = "\n              ".join(
        f"WHEN source = '{s}' THEN '{_mix_threshold(r)}'"
        for s, r in sorted(_MIX_RATES.items())
    )
    rate_whens = "\n              ".join(
        f"WHEN source = '{s}' THEN {r!r}" for s, r in sorted(_MIX_RATES.items())
    )
    return f"""
WITH d AS (
  SELECT source, n_chars,
         '0' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 2) AS h,
         CASE {whens}
              ELSE '{_mix_threshold(_MIX_DEFAULT_RATE)}' END AS thr,
         CASE {rate_whens}
              ELSE {_MIX_DEFAULT_RATE!r} END AS target_rate
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_total,
       CAST(COUNT(CASE WHEN h < thr THEN 1 END) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(SUM(CASE WHEN h < thr THEN n_chars END), 0) AS BIGINT)
         AS sum_chars_kept,
       CAST(MAX(target_rate) AS DOUBLE) AS target_rate
FROM d GROUP BY source
"""
# CAST AS DOUBLE: a bare 0.35-style literal is DECIMAL in DuckDB, and a
# DECIMAL output column can stringify differently from Spark's double under
# the driver hash (same latent class as the round-9 HUGEINT failures).


@register(
    "corpus_mix_summary", oracle=_mix_oracle(), tags=("sampling", "training")
)
def corpus_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: downsample each source to a target weight
    (the Pile/Dolma-style mixture recipe) with a DETERMINISTIC per-document
    decision — keep iff the first two hex chars of md5("mix|"+doc_id) fall
    under the source's rate threshold (1/256 granularity, pure string
    comparison). Stable across runs, engines, partitionings, and retries —
    never rand(), and keyed independently of the train/val/test split hash
    (different prefix) so mixing and splitting don't correlate.

    Map-only + one per-source aggregate; the full mix is reproducible from
    the recipe dict alone, so a 100 TB re-run (or a second engine, as the
    oracle proves) selects byte-identical documents."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT_RATE)
    for s, r in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    keep = mix_keep("doc_id", "source", _MIX_RATES, _MIX_DEFAULT_RATE)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.count(F.when(keep, 1)).alias("n_docs_kept"),
        F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("sum_chars_kept"),
        F.max(rate).alias("target_rate"),
    )


# --------------------------------------------------------------------------- #
# Replayable HLL — deterministic md5-register sketch, hash-checked.
# --------------------------------------------------------------------------- #

# Constants and expression builders live in functions/sketches.py so the
# incremental Gold maintenance (streaming/sketch_refresh.py) folds the SAME
# state the oracle certifies here.
from ..functions.sketches import (  # noqa: E402
    HLL_LINEAR_THRESHOLD as _HLL_LINEAR_THRESHOLD,
    HLL_M as _HLL_M,
    HLL_NUM as _HLL_NUM,
    HLL_RHO_EMPTY as _HLL_RHO_EMPTY,
    hll_estimate,
    hll_registers,
)


def _hll_oracle() -> str:
    return f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         md5('0|' || CAST(user_id AS VARCHAR)) || md5('1|' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
),
br AS (
  SELECT day, substr(hx, 1, 2) AS bucket,
         length(regexp_extract(substr(hx, 3), '^[0-7]*')) + 1 AS rho
  FROM ev
),
daily AS (SELECT day, bucket, MAX(rho) AS r FROM br GROUP BY day, bucket),
weekly AS (
  SELECT weekofyear(day) AS week, bucket, MAX(r) AS r FROM daily GROUP BY 1, 2
),
agg AS (
  SELECT week,
         SUM(CAST(power(2, {_HLL_RHO_EMPTY} - r) AS HUGEINT)) AS s,
         COUNT(*) AS hit
  FROM weekly GROUP BY week
),
ex AS (
  SELECT weekofyear(CAST(ts AS DATE)) AS week,
         COUNT(DISTINCT user_id) AS exact_weekly
  FROM events GROUP BY 1
),
est AS (
  SELECT week,
         CAST({_HLL_NUM} AS DOUBLE)
           / CAST(s + ({_HLL_M} - hit) * CAST(power(2, {_HLL_RHO_EMPTY}) AS HUGEINT)
                  AS DOUBLE) AS raw,
         {_HLL_M} - hit AS v
  FROM agg
)
SELECT e.week AS week,
       CASE WHEN raw <= {_HLL_LINEAR_THRESHOLD} AND v > 0
            THEN {_HLL_M} * ln({_HLL_M} / CAST(v AS DOUBLE))
            ELSE raw END AS est_weekly_users,
       ex.exact_weekly
FROM est e JOIN ex ON e.week = ex.week
"""


@register(
    "hll_weekly_users_md5",
    oracle=_hll_oracle(),
    tags=("sketch", "approx", "bench"),
)
def hll_weekly_users_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user HLL estimate from a FROM-SCRATCH deterministic
    sketch — the hash-checked twin of ``daily_user_sketch_rollup``.

    The builtin DataSketches/HLL++ aggregates are rows-only-checkable (every
    engine implements a different sketch); this one is replayable anywhere:

    * register hash: the hex string md5("0|"+uid) ∥ md5("1|"+uid) — any
      engine with md5() computes identical digits. The register bits are
      the digits' HIGH bits (digit ≥ '8'), i.e. one Bernoulli(1/2) bit per
      hex digit — the md5 bit family the oracled SimHash uses;
    * bucket = the first TWO hex digits verbatim (a 256-way string key);
      rho = 1 + the length of the leading low-digit run of the remaining
      62 digits, via one regexp_extract('^[0-7]*') — 63 if all low, no
      special case. This formulation touches the hash string exactly three
      times per row; a per-bit CASE chain re-evaluates the (non-
      materialized, projection-collapsed) md5s once per BIT — measured
      5.1 s vs ~1.0 s warm at sf0.1 for the same sketch family;
    * per-day registers = max(rho) per (day, bucket) — KB per day; the
      weekly rollup MERGES day sketches by max, never rescanning events.
      The DuckDB oracle computes weekly registers the same way, so hash
      equality certifies merge ≡ direct (max associativity) on real data;
    * estimate arithmetic is exact-integer until the last step: register
      sum Σ2^(63−r) is a DECIMAL/HUGEINT of exact powers of two (a double
      Σ2^−r would round differently per summation order), the numerator
      α·m²·2^63 is one Python-emitted double literal, so both engines do
      one identical cast + one identical IEEE division. The small-range
      linear-counting branch (taken identically — its operands are exact)
      uses ln(), where cross-engine agreement is ulp-level, absorbed by the
      gate's 12-significant-digit float rounding.

    m=256 → ±6.5% standard error; tests bound the estimate on the gate
    corpus.
    """
    events = load_table(spark, sf_dir, "events")
    daily = hll_registers(
        events.select(F.to_date("ts").alias("day"), "user_id"), ["day"], "user_id"
    )
    weekly = daily.select(
        F.weekofyear("day").cast("long").alias("week"), "bucket", "r"
    )
    est = hll_estimate(weekly, ["week"], alias="est_weekly_users")
    exact = events.groupBy(
        F.weekofyear(F.to_date("ts")).cast("long").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_weekly"))
    return est.join(exact, "week").select(
        "week", "est_weekly_users", "exact_weekly"
    )


# --------------------------------------------------------------------------- #
# Replayable DDSketch — mergeable quantiles with a relative-error guarantee
# (Masson et al., "DDSketch: a fast and fully-mergeable quantile sketch with
# relative-error guarantees", VLDB'19). The quantile sibling of the HLL above.
# --------------------------------------------------------------------------- #

from ..functions.sketches import (  # noqa: E402
    DD_GAMMA as _DD_GAMMA,
    DD_LNG as _DD_LNG,
    DD_QS as _DD_QS,
    dd_bucket_counts,
    dd_quantiles,
)


def _ddsketch_oracle() -> str:
    # Scaled-integer boundary (100*cum >= q100*total): DuckDB parses a bare
    # 0.9 literal as exact DECIMAL while Spark multiplies doubles, and
    # 0.9(double)*total can exceed the exact product at an exact-boundary
    # cumulative count, selecting adjacent buckets in the two engines.
    # Integers sidestep the float boundary entirely on both sides.
    sels = ",\n         ".join(
        f"MIN(CASE WHEN 100 * cum >= {int(round(q * 100))} * total"
        f" THEN bucket END) AS b{int(q * 100)}"
        for q in _DD_QS
    )
    ests = ",\n       ".join(
        f"2 * power({_DD_GAMMA!r}, b{int(q * 100)}) / {_DD_GAMMA + 1!r} AS p{int(q * 100)}_est"
        for q in _DD_QS
    )
    return f"""
WITH b AS (
  SELECT o_orderstatus, CAST(ceil(ln(o_totalprice) / {_DD_LNG!r}) AS BIGINT) AS bucket
  FROM orders
),
m AS (SELECT o_orderstatus, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT o_orderstatus, bucket,
         SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY o_orderstatus) AS total
  FROM m
),
sel AS (
  SELECT o_orderstatus, MAX(total) AS n_orders,
         {sels}
  FROM cum GROUP BY o_orderstatus
)
SELECT o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders,
       {ests}
FROM sel
"""


@register(
    "order_price_ddsketch",
    oracle=_ddsketch_oracle(),
    tags=("sketch", "approx", "bench"),
)
def order_price_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order-price quantiles (p50/p90/p99) from a DDSketch —
    log-γ-bucketed counts with a ±1% RELATIVE value-error guarantee at any
    quantile, fully mergeable by bucket-wise addition.

    Why this next to the exact ``order_price_quantiles``: exact percentile
    buffers every group value; the sketch is a ≤~700-bucket table per group
    however large the group, and — like the HLL rollup — per-day sketches
    fold into coarser rollups WITHOUT rescanning history. The Spark side
    deliberately routes through per-day sketches merged to status level,
    while the oracle buckets status-directly: hash equality certifies
    merge ≡ direct (bucket-sum associativity) on real data.

    Determinism notes: bucket = ceil(ln(x)/ln γ) — both engines evaluate
    ln/division on identical doubles (a disagreement would need the ratio
    within ulps of an integer; money inputs sit far from the irrational
    bucket boundaries). Quantile selection is integer cumulative-count
    logic; the value estimate 2γᵇ/(γ+1) is one pow() per OUTPUT row, ulp
    differences absorbed by the gate's 12-significant-digit rounding."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    daily = dd_bucket_counts(
        orders, ["o_orderstatus", "o_orderdate"], "o_totalprice"
    )
    return dd_quantiles(
        daily.drop("o_orderdate"), ["o_orderstatus"], _DD_QS, total_alias="n_orders"
    )


# --------------------------------------------------------------------------- #
# Day-grain sketch STATE — the tables the incremental Gold maintenance
# (streaming/sketch_refresh.py) folds batches into. Hash-oracling the state
# itself (not just the rollups above) certifies cross-engine that what the
# fold maintains is exactly what a from-scratch build produces.
# --------------------------------------------------------------------------- #

_HLL_STATE_ORACLE = """
WITH ev AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         md5('0|' || CAST(user_id AS VARCHAR)) || md5('1|' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
)
SELECT day, substr(hx, 1, 2) AS bucket,
       CAST(MAX(length(regexp_extract(substr(hx, 3), '^[0-7]*')) + 1) AS BIGINT) AS r
FROM ev GROUP BY day, bucket
"""


@register(
    "hll_daily_register_state", oracle=_HLL_STATE_ORACLE, tags=("sketch", "gold")
)
def hll_daily_register_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-grain HLL register state (day, bucket, max-rho) — the exact
    table ``streaming/sketch_refresh.fold_hll_state`` maintains
    incrementally. ≤256 rows per day whatever the event volume; weekly/
    monthly distinct estimates derive from it by register MAX without
    rescanning events (equivalence proven in tests/test_sketch_refresh.py;
    estimate arithmetic certified by ``hll_weekly_users_md5``)."""
    events = load_table(spark, sf_dir, "events")
    return hll_registers(
        events.select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
        ),
        ["day"],
        "user_id",
    ).select("day", "bucket", F.col("r").cast("long").alias("r"))


_DD_STATE_ORACLE = f"""
SELECT o_orderstatus,
       strftime(o_orderdate, '%Y-%m-%d') AS day,
       CAST(ceil(ln(o_totalprice) / {_DD_LNG!r}) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS c
FROM orders GROUP BY o_orderstatus, strftime(o_orderdate, '%Y-%m-%d'), bucket
"""


@register(
    "ddsketch_daily_bucket_state", oracle=_DD_STATE_ORACLE, tags=("sketch", "gold")
)
def ddsketch_daily_bucket_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-grain DDSketch bucket state (status, day, bucket, count) —
    the table ``streaming/sketch_refresh.fold_dd_state`` maintains by
    bucket-SUM. ≤~700 buckets per (status, day); any coarser quantile rollup
    derives from it without re-reading orders (``order_price_ddsketch``
    certifies the merge arithmetic on this same bucketing)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day"),
        "o_totalprice",
    )
    return dd_bucket_counts(orders, ["o_orderstatus", "day"], "o_totalprice").select(
        "o_orderstatus", "day", "bucket", F.col("c").cast("long").alias("c")
    )


# --------------------------------------------------------------------------- #
# Count-Min Sketch heavy hitters — frequency estimates in fixed memory.
# --------------------------------------------------------------------------- #

_CMS_TOP = 20

_CMS_ORACLE = f"""
WITH cells AS (
  SELECT j.j, substr(md5(CAST(j.j AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)), 1, 2) AS bucket,
         COUNT(*) AS c
  FROM orders, (SELECT unnest([0, 1, 2, 3]) AS j) j
  GROUP BY 1, 2
),
counts AS (SELECT o_custkey, COUNT(*) AS exact_orders FROM orders GROUP BY o_custkey),
top AS (
  SELECT o_custkey, exact_orders FROM counts
  ORDER BY exact_orders DESC, o_custkey LIMIT {_CMS_TOP}
),
looked AS (
  SELECT t.o_custkey, t.exact_orders, j.j,
         substr(md5(CAST(j.j AS VARCHAR) || '|' || CAST(t.o_custkey AS VARCHAR)), 1, 2) AS bucket
  FROM top t, (SELECT unnest([0, 1, 2, 3]) AS j) j
)
SELECT l.o_custkey,
       CAST(MAX(l.exact_orders) AS BIGINT) AS exact_orders,
       CAST(MIN(c.c) AS BIGINT) AS cms_estimate
FROM looked l JOIN cells c ON c.j = l.j AND c.bucket = l.bucket
GROUP BY l.o_custkey
"""


@register(
    "custkey_cms_heavyhitters", oracle=_CMS_ORACLE, tags=("sketch", "approx")
)
def custkey_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) order-frequency
    estimates for the top-{20} customers, next to their exact counts.

    The sketch is depth·width = 4·256 = 1024 cells HOWEVER many keys stream
    through — at 100 TB the cell table is the ONLY maintained state (merge =
    cell-wise SUM, the same incremental-Gold monoid as the HLL registers and
    DDSketch buckets), where an exact per-key count table is key-cardinality-
    shaped. estimate = min over hash rows of the key's cell, an upper bound
    on the true count (cms_estimate ≥ exact_orders for every row — the CMS
    guarantee, unit-tested; the DuckDB oracle replays hashing, cell sums,
    and lookups bit-for-bit). The exact column here is the audit baseline a
    verification query carries; a production rollup keeps cells only.

    Plan shape: ONE fact-scaled aggregate (per-key counts) feeds both the
    cells — built key-grain via ``cms_cells_from_counts``, cell-identical
    to per-row hashing but at |keys|·depth md5s instead of |rows|·depth
    (measured 55.6 s → 8.5 s at 100×) — and the top-K exact counts
    (TakeOrderedAndProject); lookups broadcast-join K·depth rows against
    the ≤1024-cell table."""
    from ..functions.sketches import CMS_DEPTH, cms_bucket, cms_cells_from_counts

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    counts = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("exact_orders")
    )
    cells = cms_cells_from_counts(counts, "o_custkey", "exact_orders")
    top = counts.orderBy(F.col("exact_orders").desc(), "o_custkey").limit(_CMS_TOP)
    looked = top.select(
        "o_custkey",
        "exact_orders",
        F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"),
    ).select(
        "o_custkey",
        "exact_orders",
        "j",
        cms_bucket("j", "o_custkey").alias("bucket"),
    )
    return (
        F.broadcast(looked)
        .join(cells, ["j", "bucket"])
        .groupBy("o_custkey")
        .agg(
            F.max("exact_orders").cast("long").alias("exact_orders"),
            F.min("c").cast("long").alias("cms_estimate"),
        )
    )


# --------------------------------------------------------------------------- #
# Month-over-month customer retention — exact, plus the HLL-algebra variant.
# --------------------------------------------------------------------------- #

_RETENTION_ORACLE = """
WITH mu AS (
  SELECT DISTINCT
    CAST(EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
    strftime(o_orderdate, '%Y-%m') AS month,
    o_custkey AS ck
  FROM orders
),
tot AS (SELECT mi, month, COUNT(*) AS active FROM mu GROUP BY mi, month),
ret AS (
  SELECT a.mi, COUNT(*) AS retained
  FROM mu a JOIN mu b ON b.mi = a.mi + 1 AND b.ck = a.ck
  GROUP BY a.mi
)
SELECT t.month,
       CAST(t.active AS BIGINT) AS active_customers,
       CAST(COALESCE(r.retained, 0) AS BIGINT) AS retained_customers,
       CAST(COALESCE(r.retained, 0) AS DOUBLE) / t.active AS retention_rate
FROM tot t
LEFT JOIN ret r ON r.mi = t.mi
WHERE t.mi + 1 IN (SELECT mi FROM tot)
"""


@register("monthly_customer_retention", oracle=_RETENTION_ORACLE, tags=("analytics",))
def monthly_customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact month-over-month customer retention: of the customers active in
    month m, how many also ordered in m+1. The exact baseline for the
    HLL-algebra variant below.

    Plan: one distinct to (month, customer) grain, then a self equi-join on
    (customer, consecutive-month) — the join shuffles month-grain distinct
    rows, never raw orders; last month (no successor) is excluded rather
    than reported as 0% retention."""
    orders = load_table(spark, sf_dir, "orders")
    mu = orders.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_custkey").alias("ck"),
    ).distinct()
    tot = mu.groupBy("mi", "month").agg(F.count(F.lit(1)).alias("active"))
    nxt = mu.select((F.col("mi") - 1).alias("mi"), "ck")
    ret = (
        mu.select("mi", "ck")
        .join(nxt, ["mi", "ck"])
        .groupBy("mi")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    has_next = tot.select((F.col("mi") - 1).alias("mi")).distinct()
    return (
        tot.join(has_next, "mi", "left_semi")
        .join(ret, "mi", "left")
        .select(
            "month",
            F.col("active").cast("long").alias("active_customers"),
            F.coalesce(F.col("retained"), F.lit(0))
            .cast("long")
            .alias("retained_customers"),
            (
                F.coalesce(F.col("retained"), F.lit(0)).cast("double")
                / F.col("active")
            ).alias("retention_rate"),
        )
    )


_HLL_RETENTION_ORACLE = f"""
WITH mu AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
         strftime(o_orderdate, '%Y-%m') AS month,
         md5('0|' || CAST(o_custkey AS VARCHAR)) || md5('1|' || CAST(o_custkey AS VARCHAR)) AS hx
  FROM orders
),
regs AS (
  SELECT mi, substr(hx, 1, 2) AS bucket,
         MAX(length(regexp_extract(substr(hx, 3), '^[0-7]*')) + 1) AS r
  FROM mu GROUP BY mi, bucket
),
months AS (SELECT DISTINCT mi, month FROM mu),
pairs AS (SELECT mi, month FROM months WHERE mi + 1 IN (SELECT mi FROM months)),
stacked AS (
  SELECT 'a' AS t, mi, bucket, r FROM regs
  UNION ALL
  SELECT 'b' AS t, mi - 1 AS mi, bucket, r FROM regs
  UNION ALL
  SELECT 'u' AS t, mi, bucket, MAX(r) AS r FROM (
    SELECT mi, bucket, r FROM regs
    UNION ALL SELECT mi - 1 AS mi, bucket, r FROM regs
  ) GROUP BY mi, bucket
),
agg AS (
  SELECT t, mi,
         SUM(CAST(power(2, {_HLL_RHO_EMPTY} - r) AS HUGEINT)) AS s,
         COUNT(*) AS hit
  FROM stacked GROUP BY t, mi
),
est AS (
  SELECT t, mi,
         CASE WHEN CAST({_HLL_NUM} AS DOUBLE)
                     / CAST(s + ({_HLL_M} - hit) * CAST(power(2, {_HLL_RHO_EMPTY}) AS HUGEINT) AS DOUBLE)
                   <= {_HLL_LINEAR_THRESHOLD}
               AND {_HLL_M} - hit > 0
              THEN {_HLL_M} * ln({_HLL_M} / CAST({_HLL_M} - hit AS DOUBLE))
              ELSE CAST({_HLL_NUM} AS DOUBLE)
                     / CAST(s + ({_HLL_M} - hit) * CAST(power(2, {_HLL_RHO_EMPTY}) AS HUGEINT) AS DOUBLE)
          END AS e
  FROM agg
),
wide AS (
  SELECT p.month, p.mi,
         MAX(CASE WHEN e.t = 'a' THEN e.e END) AS ea,
         MAX(CASE WHEN e.t = 'b' THEN e.e END) AS eb,
         MAX(CASE WHEN e.t = 'u' THEN e.e END) AS eu
  FROM pairs p JOIN est e ON e.mi = p.mi
  GROUP BY p.month, p.mi
)
SELECT month,
       ea AS est_active,
       greatest(ea + eb - eu, 0.0) AS est_retained,
       greatest(ea + eb - eu, 0.0) / ea AS est_retention_rate
FROM wide
"""


@register(
    "hll_monthly_retention_md5",
    oracle=_HLL_RETENTION_ORACLE,
    tags=("sketch", "approx"),
)
def hll_monthly_retention_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month retention from HLL register ALGEBRA — no distinct,
    no self-join on customers: |A∩B| estimated by inclusion-exclusion
    est(A)+est(B)−est(A∪B), where the union sketch is just the element-wise
    register MAX of the two months' states. This is the operation the
    sketch-state Gold layer (streaming/sketch_refresh.py) unlocks: retention
    over a billion users costs three KB-scale register reductions per month
    pair, reading ONLY the maintained state.

    Determinism: the same md5 register family as ``hll_weekly_users_md5``,
    estimated once per (tag, month) from exact-integer register sums; the
    inclusion-exclusion sum/difference and the greatest(…, 0) clamp operate
    on identically-computed doubles in both engines, so the DuckDB oracle
    hash-matches the whole algebra. m=256 → each estimate carries ~6.5%
    standard error, so the DIFFERENCE is noisy at small |A∩B| — the exact
    twin ``monthly_customer_retention`` is the audit baseline; a production
    deployment sizes m for the intersection, not the sets."""
    orders = load_table(spark, sf_dir, "orders")
    mu = orders.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_custkey",
    )
    regs = hll_registers(mu, ["mi"], "o_custkey")
    months = mu.select("mi", "month").distinct()
    pairs = months.join(
        months.select((F.col("mi") - 1).alias("mi")).distinct(), "mi", "left_semi"
    )
    shifted = regs.select((F.col("mi") - 1).alias("mi"), "bucket", "r")
    union_regs = (
        regs.unionByName(shifted)
        .groupBy("mi", "bucket")
        .agg(F.max("r").alias("r"))
        .select(F.lit("u").alias("t"), "mi", "bucket", "r")
    )
    stacked = (
        regs.select(F.lit("a").alias("t"), "mi", "bucket", "r")
        .unionByName(shifted.select(F.lit("b").alias("t"), "mi", "bucket", "r"))
        .unionByName(union_regs)
    )
    est = hll_estimate(stacked, ["t", "mi"], alias="e")
    wide = (
        F.broadcast(pairs)
        .join(est, "mi")
        .groupBy("month", "mi")
        .agg(
            F.max(F.when(F.col("t") == "a", F.col("e"))).alias("ea"),
            F.max(F.when(F.col("t") == "b", F.col("e"))).alias("eb"),
            F.max(F.when(F.col("t") == "u", F.col("e"))).alias("eu"),
        )
    )
    inter = F.greatest(F.col("ea") + F.col("eb") - F.col("eu"), F.lit(0.0))
    return wide.select(
        "month",
        F.col("ea").alias("est_active"),
        inter.alias("est_retained"),
        (inter / F.col("ea")).alias("est_retention_rate"),
    )


# --------------------------------------------------------------------------- #
# Contrastive training triples.
# --------------------------------------------------------------------------- #

NEG_BUCKETS = 16  # negative-pool buckets; scale B with corpus so per-bucket
#                   rep windows stay bounded (B ≈ corpus_rows / 1e6 at 100 TB)

_TRIPLES_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                                      i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
pos AS (
  SELECT a.doc_id AS anchor_id, b.doc_id AS positive_id
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / len(list_distinct(a.sh || b.sh)) >= 0.8
),
reps AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) AS bucket,
         ROW_NUMBER() OVER (
           PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
SELECT p.anchor_id, p.positive_id,
       min_by(r.doc_id, r.rnk) AS negative_id
FROM pos p
JOIN reps r
  ON r.bucket = substr(md5(CAST(p.anchor_id AS VARCHAR)), 32, 1)
 AND r.rnk <= 3
 AND r.doc_id <> p.anchor_id AND r.doc_id <> p.positive_id
GROUP BY p.anchor_id, p.positive_id
"""


@register("contrastive_training_triples", oracle=_TRIPLES_ORACLE, tags=("training", "bench"))
def contrastive_training_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triples for contrastive embedding
    training: positives are the shingle-Jaccard ≥ 0.8 near-dup pairs (the
    prefix-filtered exact join — candidate-bounded, never n²), negatives are
    deterministic hash-bucket representatives (the anchor's md5 tail picks a
    bucket; the bucket's lowest-hash doc that is neither anchor nor positive
    serves as the negative — stable across runs and engines, no rand()).

    Scale shape: the positive side is the near-dup operator's cost; the
    negative pool is a per-bucket top-3 window (B buckets bound each
    partition — grow NEG_BUCKETS with the corpus) joined back by bucket key,
    so negatives cost O(|pairs| + B) however large the corpus is."""
    from pyspark.sql import Window

    from ..operators.dedup import shingle_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pos = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=3).select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("positive_id")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    reps = (
        docs.select("doc_id", h.alias("h"), F.substring(h, 32, 1).alias("bucket"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "bucket", "rnk")
    )
    anchor_bucket = F.substring(F.md5(F.col("anchor_id").cast("string")), 32, 1)
    return (
        pos.withColumn("bucket", anchor_bucket)
        .join(F.broadcast(reps), "bucket")
        .filter(
            (F.col("doc_id") != F.col("anchor_id"))
            & (F.col("doc_id") != F.col("positive_id"))
        )
        .groupBy("anchor_id", "positive_id")
        .agg(F.min_by("doc_id", "rnk").alias("negative_id"))
    )


# --------------------------------------------------------------------------- #
# Weighted sampling without replacement: priority sampling (DLT 2007).
# --------------------------------------------------------------------------- #

PRIORITY_SAMPLE_N = 100
_PRIORITY_SCALE = 1_000_000_000

_PRIORITY_ORACLE = f"""
SELECT doc_id, source, weight, priority FROM (
  SELECT doc_id, source, weight,
         CAST((weight * {_PRIORITY_SCALE}) // h AS BIGINT) AS priority
  FROM (
    SELECT doc_id, source,
           CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             + 1 AS h
    FROM documents
  )
)
ORDER BY priority DESC, doc_id
LIMIT {PRIORITY_SAMPLE_N}
"""


@register(
    "priority_sampled_docs", oracle=_PRIORITY_ORACLE, tags=("sampling", "sketch")
)
def priority_sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield–Lund–Thorup, JACM 2007): each document gets priority
    q = w/u for a uniform u, and the sample is the top-N by q — items are
    included with probability ~proportional to weight, and subset-sum
    estimates from the sample (ŵ = max(w, τ) for the in-sample items,
    where τ is the (N+1)-th priority) are near-optimal-variance. The
    training-data use: sample documents proportional to length/quality for
    inspection or eval-set construction, reproducibly.

    Engine discipline: u is the md5 prefix of doc_id mapped to [1, 2³²]
    and the priority is the EXACT-INTEGER floor((w·10⁹)/h) — both engines
    therefore compute bit-identical priorities (no float log/pow, no ULP
    ordering flips) and select the identical sample; the doc_id tiebreak
    makes the order total.

    Scale shape: weights and priorities are map-side expressions;
    ``orderBy().limit(N)`` compiles to TakeOrderedAndProject — per-partition
    top-N then a driver merge of ≤ N·partitions rows, no global sort, no
    shuffle of the corpus. 100 TB cost = one scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(F.col("n_chars"), F.lit(1)).cast("long").alias("weight"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            + 1
        ).alias("h"),
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "weight",
            F.expr(f"(weight * {_PRIORITY_SCALE}L) div h").alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(PRIORITY_SAMPLE_N)
    )


# --------------------------------------------------------------------------- #
# DSIR — data selection via importance resampling over hashed n-grams.
# --------------------------------------------------------------------------- #

DSIR_BUCKETS = 256          # hashed-bigram feature space (DSIR §2.2 uses 10⁴;
#                             sized down to the test corpus' bigram volume)
DSIR_TARGET_SOURCES = ("src1", "src3", "src5")  # the "target domain" slice
DSIR_TOP = 100

_DSIR_SRC_SQL = "(" + ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES) + ")"

_DSIR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents
),
bg AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(ws[i.i] || ' ' || ws[i.i+1]), 1, 4))
              AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
),
c AS (
  SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bg GROUP BY 1, 2, 3
),
stats AS (
  SELECT b, SUM(cnt) AS rb,
         SUM(CASE WHEN source IN {_DSIR_SRC_SQL} THEN cnt ELSE 0 END) AS tb
  FROM c GROUP BY b
),
stat2 AS (
  SELECT b, rb, tb, SUM(rb) OVER () AS r, SUM(tb) OVER () AS t FROM stats
),
term AS (
  SELECT c.doc_id, c.source, c.cnt,
         CAST(CAST(c.cnt AS DOUBLE)
              * ln((CAST(s.tb + 1 AS DOUBLE) * CAST(s.r + {DSIR_BUCKETS} AS DOUBLE))
                   / (CAST(s.rb + 1 AS DOUBLE) * CAST(s.t + {DSIR_BUCKETS} AS DOUBLE)))
              AS DECIMAL(20, 9)) AS ts
  FROM c JOIN stat2 s ON s.b = c.b
)
SELECT doc_id, source, n_bigrams, dsir_score FROM (
  SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         CAST(SUM(ts) AS DOUBLE) AS dsir_score
  FROM term GROUP BY doc_id, source
)
ORDER BY dsir_score DESC, doc_id
LIMIT {DSIR_TOP}
"""


@register(
    "dsir_importance_sample",
    oracle=_DSIR_ORACLE,
    tags=("training", "sampling", "text", "bench"),
)
def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR; Xie et al.,
    NeurIPS 2023): rank raw-corpus documents by how much more likely their
    hashed-bigram profile is under a TARGET domain (here the
    {DSIR_TARGET_SOURCES} slice) than under the raw corpus —
    score(d) = Σ_b c_d(b)·(ln p̂_target(b) − ln p̂_raw(b)) with add-one
    smoothed bucket unigram models over {DSIR_BUCKETS} md5 buckets. The
    emitted top-{DSIR_TOP} is the selection a pretraining mix would pull
    from the raw pool to match the target distribution.

    Engine discipline (the BM25/perplexity recipe): bucket counts are
    exact integers; each per-(doc, bucket) term is one identically-shaped
    double expression quantized to DECIMAL(20,9), so the per-doc sum is
    exact-decimal and order-independent — and the final ranking (score
    DESC, doc_id) is total, so both engines select the identical sample.

    Scale shape: one bigram explode → (doc, bucket) partial-agg shuffle
    (bounded by docs × {DSIR_BUCKETS}); the bucket LM is a {DSIR_BUCKETS}-row
    aggregate with its corpus totals attached by a single-partition window
    over those {DSIR_BUCKETS} rows (no extra lineage branch), broadcast
    back; selection is TakeOrderedAndProject (per-partition top-N, no
    global sort). Reference basis: arXiv:2302.03169 — the hashed-ngram
    variant the paper uses for pretraining-scale selection."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("ws")
    )
    bg = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("a"),
                F.slice("ws", 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", "p.a", "p.b")), 1, 4), 16, 10
            ).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    c = bg.groupBy("doc_id", "source", "b").agg(F.count(F.lit(1)).alias("cnt"))
    stats = c.groupBy("b").agg(
        F.sum("cnt").alias("rb"),
        F.sum(
            F.when(
                F.col("source").isin(*DSIR_TARGET_SOURCES), F.col("cnt")
            ).otherwise(0)
        ).alias("tb"),
    )
    w_all = Window.partitionBy()
    stat2 = stats.select(
        "b",
        "rb",
        "tb",
        F.sum("rb").over(w_all).alias("r"),
        F.sum("tb").over(w_all).alias("t"),
    )
    d = lambda col: col.cast("double")  # noqa: E731
    lr = F.log(
        (d(F.col("tb") + 1) * d(F.col("r") + DSIR_BUCKETS))
        / (d(F.col("rb") + 1) * d(F.col("t") + DSIR_BUCKETS))
    )
    term = c.join(F.broadcast(stat2), "b").select(
        "doc_id",
        "source",
        "cnt",
        (F.col("cnt").cast("double") * lr).cast("decimal(20,9)").alias("ts"),
    )
    out = term.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.sum("ts").cast("double").alias("dsir_score"),
    )
    return out.orderBy(F.col("dsir_score").desc(), "doc_id").limit(DSIR_TOP)


# --------------------------------------------------------------------------- #
# Revenue-WEIGHTED quantiles from the same DDSketch bucket space.
# --------------------------------------------------------------------------- #

def _dd_weighted_oracle() -> str:
    sels = ",\n         ".join(
        f"MIN(CASE WHEN 100 * cum >= {int(round(q * 100))} * total"
        f" THEN bucket END) AS b{int(q * 100)}"
        for q in _DD_QS
    )
    ests = ",\n       ".join(
        f"2 * power({_DD_GAMMA!r}, b{int(q * 100)}) / {_DD_GAMMA + 1!r} AS p{int(q * 100)}_est"
        for q in _DD_QS
    )
    return f"""
WITH b AS (
  SELECT o_orderstatus,
         CAST(ceil(ln(o_totalprice) / {_DD_LNG!r}) AS BIGINT) AS bucket,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
m AS (SELECT o_orderstatus, bucket, SUM(cents) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT o_orderstatus, bucket,
         SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY o_orderstatus) AS total
  FROM m
),
sel AS (
  SELECT o_orderstatus, MAX(total) AS revenue_cents,
         {sels}
  FROM cum GROUP BY o_orderstatus
)
SELECT o_orderstatus, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       {ests}
FROM sel
"""


@register(
    "order_price_weighted_ddsketch",
    oracle=_dd_weighted_oracle(),
    tags=("bench", "sketch", "approx"),
)
def order_price_weighted_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-WEIGHTED price quantiles per status: the price point below
    which 50/90/99% of REVENUE (not order count) sits — the "where does the
    money concentrate" question count quantiles can't answer. Same log-γ
    DDSketch bucket space as ``order_price_ddsketch``; the bucket statistic
    is the SUM of exact integer cents instead of a count, so the sketch
    stays mergeable (bucket-wise +) and the cumulative/threshold logic
    stays pure-integer (100·cumw ≥ q100·totalw — no float boundary).

    Money discipline: cents = round(price·100) cast long — exact under the
    fixed-point input contract (functions/money.py); per-(status,bucket)
    cent sums fit a long with ~10⁹ headroom at the 1000× probe scale, and
    past that the split-long construction of ``scaled_long_sum`` applies
    unchanged. The Spark side routes through per-day sketches merged up
    (the incremental-Gold path); the oracle buckets directly — hash
    equality again certifies merge ≡ direct, now for weighted state."""
    from ..functions.sketches import dd_bucket, dd_quantiles

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = orders.groupBy(
        "o_orderstatus", "o_orderdate", dd_bucket("o_totalprice").alias("bucket")
    ).agg(F.sum(cents).alias("c"))
    return dd_quantiles(
        daily.drop("o_orderdate"),
        ["o_orderstatus"],
        _DD_QS,
        total_alias="revenue_cents",
    )


# --------------------------------------------------------------------------- #
# KMV / theta sketch — distinct SET OPERATIONS between groups.
# --------------------------------------------------------------------------- #

from ..functions.sketches import (  # noqa: E402
    KMV_HEX as _KMV_HEX,
    KMV_K as _KMV_K,
    KMV_NUM_D as _KMV_NUM_D,
    KMV_SENTINEL as _KMV_SENTINEL,
    KMV_SPACE_D as _KMV_SPACE_D,
    kmv_hash,
    kmv_state,
    kmv_theta,
)


def _kmv_overlap_oracle() -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority AS g,
         substr(md5(concat('k|', CAST(o_custkey AS VARCHAR))), 1, {_KMV_HEX}) AS h
  FROM orders
),
s AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d
  ) WHERE rn <= {_KMV_K}
),
th AS (
  SELECT g,
         CASE WHEN COUNT(*) = {_KMV_K} THEN MAX(h)
              ELSE '{_KMV_SENTINEL}' END AS thex,
         CASE WHEN COUNT(*) = {_KMV_K}
              THEN CAST(CAST(concat('0x', MAX(h)) AS BIGINT) AS DOUBLE)
              ELSE {_KMV_SPACE_D!r} END AS td,
         CASE WHEN COUNT(*) = {_KMV_K}
              THEN {_KMV_NUM_D!r}
                   / CAST(CAST(concat('0x', MAX(h)) AS BIGINT) AS DOUBLE)
              ELSE CAST(COUNT(*) AS DOUBLE) END AS est
  FROM s GROUP BY g
),
pairs AS (
  SELECT a.g AS prio_a, b.g AS prio_b, a.est AS est_a, b.est AS est_b,
         LEAST(a.thex, b.thex) AS thex, LEAST(a.td, b.td) AS td
  FROM th a JOIN th b ON a.g < b.g
),
i AS (
  SELECT p.prio_a, p.prio_b, COUNT(*) AS n_int
  FROM pairs p
  JOIN s sa ON sa.g = p.prio_a AND sa.h < p.thex
  JOIN s sb ON sb.g = p.prio_b AND sb.h = sa.h
  GROUP BY 1, 2
),
ua AS (
  SELECT p.prio_a, p.prio_b, COUNT(*) AS na
  FROM pairs p JOIN s sa ON sa.g = p.prio_a AND sa.h < p.thex
  GROUP BY 1, 2
),
ub AS (
  SELECT p.prio_a, p.prio_b, COUNT(*) AS nb
  FROM pairs p JOIN s sb ON sb.g = p.prio_b AND sb.h < p.thex
  GROUP BY 1, 2
)
SELECT p.prio_a, p.prio_b, p.est_a, p.est_b,
       CAST(COALESCE(i.n_int, 0) AS BIGINT) AS common_hashes,
       CAST(COALESCE(ua.na, 0) + COALESCE(ub.nb, 0) - COALESCE(i.n_int, 0)
            AS BIGINT) AS union_hashes,
       (CAST(COALESCE(i.n_int, 0) AS DOUBLE) * {_KMV_SPACE_D!r}) / p.td
           AS est_common,
       (CAST(COALESCE(ua.na, 0) + COALESCE(ub.nb, 0) - COALESCE(i.n_int, 0)
             AS DOUBLE) * {_KMV_SPACE_D!r}) / p.td AS est_union,
       CASE WHEN COALESCE(ua.na, 0) + COALESCE(ub.nb, 0)
                 - COALESCE(i.n_int, 0) > 0
            THEN CAST(COALESCE(i.n_int, 0) AS DOUBLE)
                 / CAST(COALESCE(ua.na, 0) + COALESCE(ub.nb, 0)
                        - COALESCE(i.n_int, 0) AS DOUBLE)
            ELSE 0.0 END AS jaccard_est
FROM pairs p
LEFT JOIN i  USING (prio_a, prio_b)
LEFT JOIN ua USING (prio_a, prio_b)
LEFT JOIN ub USING (prio_a, prio_b)
"""


@register(
    "kmv_priority_customer_overlap",
    oracle=_kmv_overlap_oracle(),
    tags=("bench", "sketch", "approx"),
)
def kmv_priority_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-base OVERLAP between order priorities from KMV/theta sketches
    — "how many distinct customers do priorities X and Y share?", the
    distinct-count question HLL alone can't answer (HLL unions but never
    intersects). State = the k=256 smallest md5-family hashes per priority;
    merge = union-then-retake-k (monoid, like the HLL registers / DDSketch
    buckets); intersection estimate = |common retained hashes below
    θ = min(θ_a, θ_b)| · 2⁶⁰ / θ (Beyer et al. SIGMOD'07 / the theta-sketch
    framing). Jaccard falls out as an exact-integer ratio of retained
    counts, so the hash gate anchors on integers and the only float ops are
    final IEEE divisions from identical operands.

    Scale shape: the corpus-sized work is one DISTINCT collapse to (group,
    hash) grain plus a salted two-phase k-min rank (≤ salts·k rows per
    group reach the exact rank); everything pairwise happens on KB-scale
    states with broadcast joins, O(G²) in the GROUP count (a bounded enum
    here), never in rows. The Spark side routes through per-DAY states
    merged up — the incremental-Gold path — while the oracle sketches the
    whole corpus directly: hash equality certifies merge ≡ direct.

    Reference parity: the reference has no set-operation sketch; this
    extends its distinct-count reporting (pipeline/silver_to_gold.py:96)
    the way a 100 TB audience-overlap report needs."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_custkey"
    )
    hashed = orders.select(
        "o_orderpriority", "o_orderdate", kmv_hash("o_custkey").alias("h")
    )
    day = kmv_state(hashed, ["o_orderpriority", "o_orderdate"])
    states = kmv_state(day.select("o_orderpriority", "h"), ["o_orderpriority"])
    # Collapse each group's state to ONE row carrying the sorted hash array
    # (k·15 B ≈ 4 KB/group): theta/estimate derive from the array itself
    # (n = size, θ = last element) and every pairwise set operation below
    # runs on a G-row frame with codegen'd higher-order functions — the
    # corpus pipeline appears in exactly two leaf branches (the a/b sides),
    # not once per derived quantity.
    # Materialize the G-row (≈4 KB/group) state table ONCE: the a/b pair
    # self-join below would otherwise re-derive the ENTIRE corpus pipeline —
    # scan + distinct + both salted k-min window rounds — per side (round-15
    # plan audit: 2 scans, 8 window stages; AQE's runtime stage reuse does
    # not collapse the duplicated window chains above the last exchange).
    # Eager localCheckpoint pins the tiny frame so the corpus runs once:
    # 3.09 s → 2.33 s noop at sf0.1. Values unchanged — materialization only.
    garr = (
        states.groupBy("o_orderpriority")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .localCheckpoint(eager=True)
    )
    sat = F.size("hs") == _KMV_K
    td_sat = F.conv(F.element_at("hs", -1), 16, 10).cast("long").cast("double")
    th = garr.select(
        "o_orderpriority",
        "hs",
        F.when(sat, F.element_at("hs", -1))
        .otherwise(F.lit(_KMV_SENTINEL))
        .alias("thex"),
        F.when(sat, td_sat).otherwise(F.lit(_KMV_SPACE_D)).alias("td"),
        F.when(sat, F.lit(_KMV_NUM_D) / td_sat)
        .otherwise(F.size("hs").cast("double"))
        .alias("est"),
    )
    a = th.select(
        F.col("o_orderpriority").alias("prio_a"),
        F.col("est").alias("est_a"),
        F.col("thex").alias("thex_a"),
        F.col("td").alias("td_a"),
        F.col("hs").alias("hs_a"),
    )
    b = th.select(
        F.col("o_orderpriority").alias("prio_b"),
        F.col("est").alias("est_b"),
        F.col("thex").alias("thex_b"),
        F.col("td").alias("td_b"),
        F.col("hs").alias("hs_b"),
    )
    thex = F.least("thex_a", "thex_b")
    ua = F.filter("hs_a", lambda x: x < thex)
    ub = F.filter("hs_b", lambda x: x < thex)
    pairs = a.join(F.broadcast(b), F.col("prio_a") < F.col("prio_b")).select(
        "prio_a",
        "prio_b",
        "est_a",
        "est_b",
        F.least("td_a", "td_b").alias("td"),
        F.size(ua).cast("long").alias("na"),
        F.size(ub).cast("long").alias("nb"),
        F.size(F.array_intersect(ua, ub)).cast("long").alias("n_int"),
    )
    n_union = F.col("na") + F.col("nb") - F.col("n_int")
    return pairs.select(
        "prio_a",
        "prio_b",
        "est_a",
        "est_b",
        F.col("n_int").alias("common_hashes"),
        n_union.alias("union_hashes"),
        ((F.col("n_int").cast("double") * F.lit(_KMV_SPACE_D)) / F.col("td")).alias(
            "est_common"
        ),
        ((n_union.cast("double") * F.lit(_KMV_SPACE_D)) / F.col("td")).alias(
            "est_union"
        ),
        F.when(n_union > 0, F.col("n_int").cast("double") / n_union.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


# --------------------------------------------------------------------------- #
# Temperature-based mixture sampling (round 12): DERIVED per-source rates.
# --------------------------------------------------------------------------- #
#
# ``corpus_mix_summary`` mixes with a HAND-PINNED rate recipe; the other
# standard construction (multilingual/multi-domain pretraining, e.g.
# mBERT/XLM-R and the Pile appendices) derives the rates FROM the corpus:
# sample source s proportionally to n_s^alpha (alpha = 0.5 here), which
# up-weights small sources and flattens the head. Everything below is
# INTEGER arithmetic so both engines agree exactly:
#   w_s   = floor(sqrt(n_s))        (IEEE sqrt is correctly rounded — the
#                                    doubles, hence the floors, are equal
#                                    cross-engine by standard, not luck)
#   N     = D div 2                 (budget: half the corpus)
#   q_s   = min(n_s, (N * w_s) div sum(w))
#   keep  = hash24(doc) * n_s < q_s * 2^24   (pure int64 compare; hash24 is
#           the first 6 hex chars of md5('tmix|'+doc_id) — its own key
#           prefix, so the decision never correlates with the split or mix
#           hashes). int64 bound: hash24 * n_s overflows only past n_s ~
#           5.5e11 docs PER SOURCE; shrink to 5 hex chars long before that.

_TMIX_HEX = 6
_TMIX_SPACE = 16 ** _TMIX_HEX

_TMIX_ALLOC_SQL = f"""
src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS sqrt_weight
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS d_total,
         CAST(SUM(sqrt_weight) AS BIGINT) AS w_total
  FROM src
),
alloc AS (
  SELECT source, n_docs, sqrt_weight,
         LEAST(n_docs, ((d_total // 2) * sqrt_weight) // w_total) AS quota
  FROM src, tot
),
kept AS (
  SELECT d.doc_id, d.source, a.n_docs, a.sqrt_weight, a.quota
  FROM documents d JOIN alloc a USING (source)
  WHERE CAST(('0x' || substr(md5('tmix|' || CAST(d.doc_id AS VARCHAR)), 1,
              {_TMIX_HEX})) AS BIGINT) * a.n_docs
        < a.quota * {_TMIX_SPACE}
)
"""

_TMIX_SUMMARY_ORACLE = f"""
WITH {_TMIX_ALLOC_SQL}
SELECT a.source, a.n_docs, a.sqrt_weight, CAST(a.quota AS BIGINT) AS quota,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept
FROM alloc a LEFT JOIN kept k ON a.source = k.source
GROUP BY a.source, a.n_docs, a.sqrt_weight, a.quota
"""

_TMIX_SAMPLE_ORACLE = f"""
WITH {_TMIX_ALLOC_SQL}
SELECT doc_id, source FROM kept
"""


def _tmix_plan(docs: DataFrame):
    """(alloc, kept) DataFrames of the temperature mix — alloc is
    sources-sized (broadcast both times it is joined), kept is the
    deterministic sample."""
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.floor(F.sqrt(F.count(F.lit(1)))).cast("long").alias("sqrt_weight"),
    )
    tot = src.agg(
        F.sum("n_docs").cast("long").alias("d_total"),
        F.sum("sqrt_weight").cast("long").alias("w_total"),
    )
    alloc = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sqrt_weight",
        F.least(
            F.col("n_docs"),
            F.expr("((d_total div 2) * sqrt_weight) div w_total"),
        ).alias("quota"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("tmix|"), F.col("doc_id").cast("string"))),
            1,
            _TMIX_HEX,
        ),
        16,
        10,
    ).cast("long")
    kept = (
        docs.select("doc_id", "source", h.alias("h24"))
        .join(F.broadcast(alloc), "source")
        .filter(
            F.col("h24") * F.col("n_docs")
            < F.col("quota") * F.lit(_TMIX_SPACE)
        )
    )
    return alloc, kept


@register(
    "temperature_mix_allocation",
    oracle=_TMIX_SUMMARY_ORACLE,
    tags=("sampling", "training"),
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source allocation of the alpha=0.5 temperature mix — counts,
    integer sqrt weight, quota, and how many documents the deterministic
    md5 rule actually keeps. The rates are DERIVED from the corpus (the
    multilingual-pretraining n^alpha recipe), complementing the pinned-
    recipe ``corpus_mix_summary``; all-integer arithmetic keeps the two
    engines exactly aligned (header comment).

    Plan shape: one sources-sized aggregate, a 1-row broadcast for the
    corpus totals (the BM25 discipline — no driver collect), then a
    broadcast probe of the document scan; at 100 TB the only exchange is
    the per-source count."""
    docs = load_table(spark, sf_dir, "documents")
    alloc, kept = _tmix_plan(docs)
    kept_counts = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return (
        alloc.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_docs",
            "sqrt_weight",
            "quota",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


@register(
    "temperature_mix_sample",
    oracle=_TMIX_SAMPLE_ORACLE,
    tags=("sampling", "training"),
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept document set of the alpha=0.5 temperature mix — the
    deterministic, engine-independent sample a 100 TB re-run (or DuckDB,
    as the oracle proves) reproduces byte-identically. Map-only after a
    broadcast of the sources-sized allocation table."""
    docs = load_table(spark, sf_dir, "documents")
    _, kept = _tmix_plan(docs)
    return kept.select("doc_id", "source")
