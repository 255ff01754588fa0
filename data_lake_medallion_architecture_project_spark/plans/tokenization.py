"""Tokenizer-aware token counting — the budget estimator for training cost.

Whitespace token counts (``doc_token_stats``) undercount what a BPE
tokenizer actually emits; real pipelines budget compute in tokenizer
pieces. Without shipping a vocabulary, the standard estimator is:

* pre-tokenize GPT-2-style into word/number runs and single punctuation
  marks;
* charge each alphanumeric run ``ceil(len/4)`` pieces (the ~4-chars-per-BPE
  heuristic) and each punctuation mark 1 piece.

Cross-engine regex discipline: the pattern's alternatives
(``[a-z0-9]+`` vs ``[^a-z0-9\\s]``) match DISJOINT character classes, so
leftmost-first (Java regex) and RE2 (DuckDB) produce identical match lists
— no alternation-order or lookaround traps (RE2 has no lookahead, so the
true GPT-2 pattern with ``\\s+(?!\\S)`` cannot be oracled). All pure-JVM:
regexp_extract_all + array folds, map-only, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count, tokenize
from ..sources.readers import load_table
from .registry import register

_PRETOKEN_RE = r"[a-z0-9]+|[^a-z0-9\s]"

_BPE_ORACLE = rf"""
WITH m AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{_PRETOKEN_RE}') AS pieces,
         len(string_split(lower(text), ' ')) AS n_ws_tokens
  FROM documents
)
SELECT doc_id,
       CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
       CAST(len(pieces) AS BIGINT) AS n_pretokens,
       CAST(COALESCE(list_sum(list_transform(pieces,
              x -> CASE WHEN regexp_matches(x, '^[a-z0-9]')
                        THEN CAST(CEIL(LEN(x) / 4.0) AS BIGINT)
                        ELSE 1 END)), 0) AS BIGINT) AS n_bpe_est
FROM m
"""


@register("bpe_token_estimates", oracle=_BPE_ORACLE, tags=("text", "training"))
def bpe_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budgets at three fidelities: whitespace tokens,
    GPT-2-style pre-tokens (word/number runs + punctuation marks), and the
    ceil(len/4)-per-run BPE piece estimate. Map-only JVM regex + folds; the
    pieces array is projected to a column before the fold lambda (the
    lambda-CSE discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    with_pieces = docs.select(
        "doc_id",
        token_count(tokenize("text")).alias("n_ws_tokens"),
        F.regexp_extract_all(F.lower("text"), F.lit(_PRETOKEN_RE), 0).alias(
            "pieces"
        ),
    )
    piece_cost = lambda x: (  # noqa: E731
        F.when(x.rlike("^[a-z0-9]"), F.ceil(F.length(x) / 4.0)).otherwise(
            F.lit(1)
        ).cast("long")
    )
    return with_pieces.select(
        "doc_id",
        "n_ws_tokens",
        F.size("pieces").cast("long").alias("n_pretokens"),
        F.aggregate(
            F.transform("pieces", piece_cost),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_bpe_est"),
    )


# --------------------------------------------------------------------------- #
# Exact pinned-BPE tokenization (round 12): the real tokenizer, cross-engine.
# --------------------------------------------------------------------------- #

_SEP = "\x1f"  # symbol guard (U+001F unit separator)
_WSEP = "\x1e"  # word guard (U+001E record separator)
_EOW = "</w>"  # end-of-word marker, operators/bpe.py:_END


def _bpe_replace_chain():
    """The pinned merge table as an ordered list of (search, replacement)
    flat-string rewrites. A word's symbol sequence is rendered as
    ``\\x1f s1 \\x1f\\x1f s2 \\x1f\\x1f ... sk \\x1f`` (every symbol wrapped
    in U+001F guards), so the rewrite ``\\x1f a \\x1f\\x1f b \\x1f →
    \\x1f ab \\x1f`` can only fire where symbol a is immediately followed
    by symbol b — never inside a multi-char symbol, and never across the
    U+001E word boundary. Plain left-to-right non-overlapping replace()
    (identical semantics in the JVM and DuckDB) IS greedy leftmost pair
    merging; applying the merges in pinned rank order is exactly the
    canonical lowest-rank-first encode, because BPE training can only emit
    a merge whose component symbols were built by strictly earlier merges
    (so a later rewrite can never create an occurrence of an earlier
    pair)."""
    from ._pinned_bpe import _BPE_MERGES

    return [
        (f"{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}", f"{_SEP}{a}{b}{_SEP}")
        for a, b in _BPE_MERGES
    ]


def _bpe_oracle() -> str:
    def q(s: str) -> str:  # SQL string literal (symbols may hold quotes)
        return "'" + s.replace("'", "''") + "'"

    rep = "rep"
    for search, repl in _bpe_replace_chain():
        rep = f"replace({rep}, {q(search)}, {q(repl)})"
    return rf"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_ws_tokens,
         array_to_string(list_transform(words, w ->
           {q(_SEP)} ||
           array_to_string(list_append(regexp_extract_all(w, '[\s\S]'),
                                       {q(_EOW)}),
                           {q(_SEP + _SEP)}) ||
           {q(_SEP)}), {q(_WSEP)}) AS rep
  FROM w
),
e AS (SELECT doc_id, n_ws_tokens, {rep} AS repf FROM r)
SELECT doc_id, n_ws_tokens,
       CAST(n_ws_tokens + length(repf)
            - length(replace(repf, {q(_SEP + _SEP)}, {q(_SEP)}))
         AS BIGINT) AS n_bpe_tokens
FROM e
"""


@register(
    "bpe_encoded_token_counts",
    oracle=_bpe_oracle(),
    tags=("text", "training", "ml", "bench"),
)
def bpe_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-document token counts under the pinned 48-merge BPE model
    (plans/_pinned_bpe.py, trained by tools/pin_bpe.py with
    operators/bpe.py:train_bpe) — the tokenizer tier promoted from a
    pandas-UDF pytest-only path (``encode_with_merges``) to a
    hash-certified, pure-JVM surface, the r10 PCA / r11 logreg precedent
    applied to tokenization.

    Mechanics: each word is rendered as a U+001F-guarded flat symbol
    string (chars + the ``</w>`` marker, the trainer's representation),
    words joined under a U+001E guard, and the pinned merges applied in
    rank order as plain substring rewrites — see ``_bpe_replace_chain``
    for why that is bit-for-bit the canonical greedy encode. The piece
    count falls out as the count of adjacent-guard pairs plus one per
    word, all integer arithmetic. (Documents containing the U+001F/U+001E
    guard bytes would perturb both engines IDENTICALLY — parity is
    structural — but real corpora should strip control bytes upstream.)

    Scale shape: map-only column expressions — one scan, ZERO exchange,
    no Python anywhere; dead-linear and embarrassingly parallel across
    input splits, but the chain CPU is paid on every word OCCURRENCE
    (~0.3 ms/document single-core, measured). This is the
    certification/zero-shuffle tier; when corpus >> vocabulary the
    occurrence-deduped twin ``bpe_token_counts_vocab`` (identical
    output, equivalence-tested) is the scale path — the SemDeDup
    exact-vs-BLAS tiering applied to tokenization. The pandas-UDF
    encoder remains for consumers that need the piece ARRAYS themselves."""
    from ..sources.readers import spread_small_scan

    # ~0.3 ms/document of chain CPU on a one-row-group test file = a
    # single-core stage; the conditional spread (no-op at scale) floors the
    # parallelism. Measured 1.74 → 0.5-0.65 s noop at sf0.1 (round 15).
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    words = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    word_rep = lambda w: F.concat(  # noqa: E731
        F.lit(_SEP),
        F.array_join(
            F.concat(F.split(w, ""), F.array(F.lit(_EOW))), _SEP + _SEP
        ),
        F.lit(_SEP),
    )
    base = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_ws_tokens"),
        F.array_join(F.transform(words, word_rep), _WSEP).alias("rep"),
    )
    rep = F.col("rep")
    for search, repl in _bpe_replace_chain():
        rep = F.replace(rep, F.lit(search), F.lit(repl))
    return base.select(
        "doc_id",
        "n_ws_tokens",
        (
            F.col("n_ws_tokens")
            + F.length(rep)
            - F.length(F.replace(rep, F.lit(_SEP + _SEP), F.lit(_SEP)))
        ).cast("long").alias("n_bpe_tokens"),
    )


def _bpe_word_pieces_expr(word_col: str):
    """Piece count of ONE word under the pinned merges: guarded flat rep →
    rank-order rewrite chain → half the surviving guard chars."""
    rep = F.concat(
        F.lit(_SEP),
        F.array_join(
            F.concat(F.split(F.col(word_col), ""), F.array(F.lit(_EOW))),
            _SEP + _SEP,
        ),
        F.lit(_SEP),
    )
    for search, repl in _bpe_replace_chain():
        rep = F.replace(rep, F.lit(search), F.lit(repl))
    return (
        (F.length(rep) - F.length(F.replace(rep, F.lit(_SEP), F.lit(""))))
        / F.lit(2)
    ).cast("long")


def _bpe_vocab_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rep = (
        f"{q(_SEP)} || array_to_string(list_append("
        f"regexp_extract_all(word, '[\\s\\S]'), {q(_EOW)}),"
        f" {q(_SEP + _SEP)}) || {q(_SEP)}"
    )
    for search, repl in _bpe_replace_chain():
        rep = f"replace({rep}, {q(search)}, {q(repl)})"
    return f"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS word
  FROM documents
),
v AS (SELECT DISTINCT word FROM t),
enc AS (
  SELECT word,
         (length(repf) - length(replace(repf, {q(_SEP)}, ''))) // 2
           AS n_pieces
  FROM (SELECT word, {rep} AS repf FROM v)
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
         CAST(SUM(e.n_pieces) AS BIGINT) AS n_bpe_tokens
  FROM t JOIN enc e USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_ws_tokens, 0) AS BIGINT) AS n_ws_tokens,
       CAST(COALESCE(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register(
    "bpe_token_counts_vocab",
    oracle=_bpe_vocab_oracle(),
    # bench (r13): this is the tier users actually run at scale — the flat
    # twin was measured while the scale path had only SCALE.md self-probes.
    tags=("text", "training", "ml", "bench"),
)
def bpe_token_counts_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-TIER form of ``bpe_encoded_token_counts`` — identical
    output (equivalence-tested), different cost model: the 48-rewrite
    chain runs once per DISTINCT word (Heaps'-law-sublinear vocab), and
    the corpus-sized work collapses to an explode, an AQE-broadcastable
    word→pieces join, and one per-document aggregate.

    Why both forms exist (the SemDeDup exact/BLAS precedent): the flat
    per-document chain is zero-shuffle but pays chain CPU on every
    OCCURRENCE (~0.3 ms per document single-core, measured — linear but
    CPU-bound); this form pays two corpus-sized exchanges (explode-join
    and the doc regroup) but only vocab-sized chain CPU. On any real
    corpus (trillions of words, millions-not-trillions of distinct
    words) occurrence-dedup wins by orders of magnitude — measured
    probes in SCALE.md: 13.5 s vs 1.5 s at 10×, 147 s vs 9 s at 100×
    on the replicated corpus. Both are hash-certified against the same
    DuckDB algorithm, so the tiers cannot drift apart silently."""
    return bpe_token_counts_for(load_table(spark, sf_dir, "documents"))


def bpe_token_counts_for(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The vocab-tier counting over an ARBITRARY document DataFrame:
    (doc_id, n_ws_tokens, n_bpe_tokens) under the pinned merges — the
    reusable form trainprep's ``--pack-tokenizer bpe`` budgets packs
    with. Same plan as the certified registry query (which is this,
    applied to the sf table)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    vocab_pieces = (
        toks.select("word")
        .distinct()
        .select("word", _bpe_word_pieces_expr("word").alias("n_pieces"))
    )
    per_doc = (
        toks.join(vocab_pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ws_tokens"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ws_tokens"), F.lit(0))
            .cast("long")
            .alias("n_ws_tokens"),
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def _bpe_freq_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rep = (
        f"{q(_SEP)} || array_to_string(list_append("
        f"regexp_extract_all(word, '[\\s\\S]'), {q(_EOW)}),"
        f" {q(_SEP + _SEP)}) || {q(_SEP)}"
    )
    for search, repl in _bpe_replace_chain():
        rep = f"replace({rep}, {q(search)}, {q(repl)})"
    return f"""
WITH t AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS word
  FROM documents
),
w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_w FROM t GROUP BY word),
enc AS (SELECT word, n_w, {rep} AS repf FROM w),
p AS (
  SELECT word, n_w,
         unnest(string_split(substr(repf, 2, length(repf) - 2),
                             {q(_SEP + _SEP)})) AS piece
  FROM enc
)
SELECT piece,
       CAST(SUM(n_w) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
FROM p GROUP BY piece
"""


@register(
    "bpe_piece_frequencies",
    oracle=_bpe_freq_oracle(),
    tags=("text", "training", "ml"),
)
def bpe_piece_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus piece-frequency table under the pinned BPE model: for every
    emitted piece, its total occurrence count and how many distinct words
    produce it — the vocabulary-usage profile a tokenizer owner reads to
    size vocabularies and spot fertility problems (rare pieces = wasted
    embedding rows; high char-level residue = merges too shallow).

    Scale shape (the vocab tier throughout): the rewrite chain and the
    piece explode run once per DISTINCT word; corpus-sized work is one
    word-count aggregate. The piece list falls out of the flat encoding
    by collapsing the word guards and splitting on the symbol guard —
    no second tokenizer implementation to drift from the certified one."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    w = toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    rep = F.concat(
        F.lit(_SEP),
        F.array_join(
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(_EOW))),
            _SEP + _SEP,
        ),
        F.lit(_SEP),
    )
    for search, repl in _bpe_replace_chain():
        rep = F.replace(rep, F.lit(search), F.lit(repl))
    enc = w.select("word", "n_w", rep.alias("repf"))
    pieces = enc.select(
        "word",
        "n_w",
        F.explode(
            F.split(
                F.expr("substr(repf, 2, length(repf) - 2)"), _SEP + _SEP
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(
        F.sum("n_w").cast("long").alias("n_occurrences"),
        F.countDistinct("word").cast("long").alias("n_distinct_words"),
    )
