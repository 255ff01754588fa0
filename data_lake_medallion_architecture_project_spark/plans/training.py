"""Training-data-pipeline shapes: document chunking and sequence packing.

Neither exists in the reference (its documents never feed a trainer); both are
core operations of an LLM data pipeline at 100 TB:

* **chunking** — split each document's token stream into overlapping
  fixed-size windows (the units a tokenizer/trainer actually consumes);
* **packing** — assign whole documents to fixed-token-budget training
  sequences so batch construction wastes no padding.

Both are pure JVM column/window expressions — no Python boundary — and both
are DuckDB-oracled (the chunk slicing and the prefix-sum packing have exact
relational semantics).

Scale notes:

* chunking is embarrassingly parallel (per-row explode; output rows ≈
  n_tokens/stride per doc). The explode multiplies row count, not bytes read;
  column pruning keeps only (doc_id, toks) flowing into it.
* packing needs a running sum, which is a global sequential dependency; the
  scalable form shards the corpus (hash of doc_id) and packs each shard
  independently — one window task per shard, so parallelism = n_shards and
  the boundary effect is < budget tokens of slack per shard, not per corpus.
  At 100 TB raise ``n_shards`` to O(cluster cores); packs remain
  deterministic because shard assignment and intra-shard order key on doc_id
  alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    dup_gram_frac,
    shingles,
    token_count,
    tokenize,
    top_gram_mass,
)
from ..sources.readers import load_table
from .registry import register

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # chunk start step (overlap = _CHUNK - _STRIDE)

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
e AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS chunk_start
  FROM t
  WHERE len(toks) > 0
)
SELECT
  doc_id,
  chunk_start,
  len(toks[chunk_start + 1 : chunk_start + {_CHUNK}]) AS chunk_len,
  array_to_string(toks[chunk_start + 1 : chunk_start + {_CHUNK}], ' ') AS chunk_text
FROM e
"""


@register("doc_chunks", oracle=_CHUNK_ORACLE, tags=("text", "training"))
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: one output row per (doc, window).

    Window starts step by ``_STRIDE`` (sequence with step — identical
    inclusive-stop semantics to DuckDB's generate_series), each chunk is a
    1-based ``slice`` of ``_CHUNK`` tokens that truncates at the document tail
    (same clamping as DuckDB list slicing). All JVM: split → sequence →
    explode → slice; the scan reads only (doc_id, text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    return (
        toks.filter(F.col("n") > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))
            ).alias("chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.slice(F.col("toks"), F.col("chunk_start") + 1, _CHUNK).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.size("chunk").cast("long").alias("chunk_len"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


_PACK_BUDGET = 256  # tokens per training sequence
_PACK_SHARDS = 8  # independent packing streams (→ window parallelism)

_PACK_ORACLE = f"""
WITH t AS (
  SELECT
    doc_id,
    len(string_split(lower(text), ' ')) AS n_tokens,
    doc_id % {_PACK_SHARDS} AS shard
  FROM documents
),
c AS (
  SELECT
    doc_id, n_tokens, shard,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cum_before
  FROM t
)
SELECT
  doc_id,
  n_tokens,
  shard,
  CAST(FLOOR(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
FROM c
"""


def pack_documents(
    docs: DataFrame,
    budget: int = _PACK_BUDGET,
    n_shards: int | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Token-budget sequence packing: assign every document to a pack.

    Fixed-boundary packing: within a shard, docs are laid end-to-end in
    doc_id order and ``pack_id = floor(tokens_before / budget)`` — each pack
    holds whole documents and may overflow the budget by at most one
    document's tokens (standard approximate packing; trainers truncate the
    tail). The exclusive prefix sum is a ROWS-frame window per shard, so the
    sort is per-shard and parallelism equals ``n_shards``.

    ``n_shards`` defaults to the cluster's default parallelism — O(cores),
    the right setting at 100 TB. A shard's packing depends only on its own
    ordered doc list (shard assignment and intra-shard order key on doc_id
    alone), so changing ``n_shards`` re-buckets documents but never reorders
    a shard internally — pack contents stay deterministic for any fixed
    shard count (property-tested in tests/test_advanced.py).

    ``n_tokens_col`` swaps the budgeting unit: when given, documents must
    carry that precomputed per-document count column (e.g. the exact
    pinned-BPE counts of ``plans/tokenization.py:bpe_token_counts_for`` —
    real tokenizer pieces, the unit trainers actually budget in) and the
    whitespace tokenize is skipped; the default stays the certified
    whitespace form the registry oracle replays.
    """
    if n_shards is None:
        n_shards = docs.sparkSession.sparkContext.defaultParallelism
    n_tokens = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else token_count(tokenize("text"))
    )
    t = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(int(n_shards))).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return t.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.floor(cum_before / F.lit(float(budget)))
        .cast("long")
        .alias("pack_id"),
    )


_DECON_N = 5  # n-gram length for the overlap check
_DECON_EVAL_MOD = 25  # doc_id % MOD == 0 → the held-out "benchmark" set

_DECON_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - {_DECON_N - 2}),
                                      i -> array_to_string(t[i:i+{_DECON_N - 1}], ' '))) AS sh
  FROM t WHERE len(t) >= {_DECON_N}
),
e AS (
  SELECT doc_id AS eval_id, unnest(sh) AS g FROM s
  WHERE doc_id % {_DECON_EVAL_MOD} = 0
),
c AS (
  SELECT doc_id, unnest(sh) AS g FROM s
  WHERE doc_id % {_DECON_EVAL_MOD} <> 0
)
SELECT c.doc_id, e.eval_id, COUNT(*) AS n_shared
FROM c JOIN e USING (g)
GROUP BY c.doc_id, e.eval_id
"""


@register("benchmark_contamination", oracle=_DECON_ORACLE, tags=("text", "training"))
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: corpus documents sharing any word
    ``_DECON_N``-gram with a held-out benchmark set (here: doc_id %
    ``_DECON_EVAL_MOD`` == 0 stands in for the eval suite), with the count
    of shared distinct n-grams per (corpus doc, eval doc) pair — the overlap
    check every serious pretraining pipeline runs before training.

    Scale shape (the reason this is NOT a Jaccard self-join): the eval side
    is tiny and known, so its exploded n-gram set is **broadcast** and the
    corpus is a single map-side scan — explode → broadcast hash join →
    partial-agg. The corpus never shuffles; only matched (doc, eval, gram)
    hits move, and the group-by keys are the hit pairs. At 100 TB this is
    one pass over the corpus regardless of eval-suite count."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokenize("text").alias("t"))
        .filter(F.size("t") >= _DECON_N)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("t"), _DECON_N))).alias("g"),
        )
    )
    is_eval = F.pmod(F.col("doc_id"), F.lit(_DECON_EVAL_MOD)) == 0
    eval_sh = sh.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "g")
    corpus_sh = sh.filter(~is_eval)
    return (
        corpus_sh.join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register("packed_sequences", oracle=_PACK_ORACLE, tags=("text", "training"))
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of ``pack_documents`` with ``n_shards`` pinned to
    ``_PACK_SHARDS`` (= 8) so the shard column — part of the output — is
    deterministic against the DuckDB oracle regardless of local core count."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_documents(docs, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)


_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
g2 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> array_to_string(t[i:i+1], ' '))) AS g
  FROM t WHERE len(t) >= 2
),
top2 AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_bigram_mass
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' '))) AS g
  FROM t WHERE len(t) >= 3
),
dup3 AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT g) * 1.0 / COUNT(*) AS dup_trigram_frac
  FROM g3 GROUP BY doc_id
)
SELECT d.doc_id, top2.top_bigram_mass, dup3.dup_trigram_frac
FROM (SELECT doc_id FROM documents) d
LEFT JOIN top2 USING (doc_id)
LEFT JOIN dup3 USING (doc_id)
"""


@register(
    "doc_repetition_signals",
    oracle=_REPETITION_ORACLE,
    tags=("text", "training", "quality"),
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText within-document repetition filters: the mass
    fraction of the single most frequent 2-gram and the fraction of 3-gram
    occurrences that repeat an earlier one. High values mark boilerplate /
    looping spam that cross-document dedup cannot catch.

    Map-only: both signals are pure-JVM higher-order folds over each row's
    token array (functions/text.py:top_gram_mass/dup_gram_frac) — no
    explode, no shuffle, one corpus pass at any scale. The gram arrays are
    projected to columns BEFORE the folds: Catalyst does no CSE inside
    lambda bodies, so inlining the shingle construction would rebuild the
    array per distinct element (measured 10×; see top_gram_mass docstring).
    Docs too short for an n-gram yield NULL (matching the oracle's LEFT
    JOINs). The DuckDB oracle must unnest + group per gram — the fold form
    exists only Spark-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    grammed = docs.select(
        "doc_id",
        F.when(F.size(toks) >= 2, shingles(toks, 2)).alias("g2"),
        F.when(F.size(toks) >= 3, shingles(toks, 3)).alias("g3"),
    )
    return grammed.select(
        "doc_id",
        top_gram_mass(F.col("g2")).alias("top_bigram_mass"),
        dup_gram_frac(F.col("g3")).alias("dup_trigram_frac"),
    )
