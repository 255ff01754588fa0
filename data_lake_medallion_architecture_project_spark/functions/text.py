"""Text-analysis column kernels for the training-data pipeline surface.

All kernels are pure JVM-side column expressions (no Python UDFs): tokenize via
``split``, statistics via ``transform``/``aggregate`` array folds, fingerprints
via ``md5``. At 100 TB these run inside whole-stage codegen and never cross the
Python boundary.

Tokenization contract (shared with the DuckDB oracles): lowercase, split on a
single space. Integer-valued outputs stay integers; ratio outputs are a single
IEEE-754 division of two exact integers, so they are engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lists (most frequent function words — public
# knowledge) used by quality scoring and the n-gram/stopword language-ID
# heuristic. Overlapping words ("la", "un", "en") are fine: language-ID takes
# the argmax of hit counts, not exclusive membership.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "with", "by", "at", "as", "it", "that",
)
DE_STOPWORDS = (
    "der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
    "zu", "den", "von", "für", "auf", "im", "sich",
)
FR_STOPWORDS = (
    "le", "la", "les", "et", "est", "un", "une", "dans", "de", "du",
    "que", "pour", "pas", "sur", "avec", "au",
)
ES_STOPWORDS = (
    "el", "la", "los", "las", "y", "es", "un", "una", "en", "de",
    "que", "por", "con", "para", "no", "se",
)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": EN_STOPWORDS,
    "de": DE_STOPWORDS,
    "fr": FR_STOPWORDS,
    "es": ES_STOPWORDS,
}
# Deterministic precedence for argmax ties.
LANG_PRECEDENCE = ("en", "de", "fr", "es")


def tokenize(col: Column | str) -> Column:
    """Lowercase whitespace tokens. Mirror: ``string_split(lower(x), ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def normalize_text(col: Column | str) -> Column:
    """CCNet-style normalization for robust dedup keys: lowercase, strip
    everything outside [a-z0-9 ], collapse whitespace runs, trim. The
    patterns are deliberately plain character classes so Java regex (Spark)
    and RE2 (DuckDB) agree byte-for-byte — the registry oracle replays
    ``trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9 ]', '', 'g'),
    ' +', ' ', 'g'))`` exactly."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def token_count(tokens: Column) -> Column:
    return F.size(tokens).cast("long")


def distinct_token_count(tokens: Column) -> Column:
    return F.size(F.array_distinct(tokens)).cast("long")


def total_token_chars(tokens: Column) -> Column:
    """Sum of token lengths via an integer array fold (deterministic)."""
    return F.aggregate(
        F.transform(tokens, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def stopword_count(tokens: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords))).cast("long")


def predict_language(tokens: Column) -> Column:
    """Stopword-overlap language ID: argmax of per-language hit counts with
    deterministic precedence (en > de > fr > es); zero hits → 'unknown'."""
    # NB: the lambda must take exactly one arg — PySpark passes the array
    # index as a second arg to two-parameter lambdas, which would shadow a
    # default-arg capture. A factory function closes over the word list.
    def _hits(words: tuple[str, ...]):
        return F.size(F.filter(tokens, lambda t: t.isin(*words)))

    hits = {lang: _hits(ws) for lang, ws in LANG_STOPWORDS.items()}
    expr = F.lit("unknown")
    # Build the CASE chain in reverse precedence so earlier languages win ties.
    for lang in reversed(LANG_PRECEDENCE):
        others = [hits[o] for o in LANG_PRECEDENCE if o != lang]
        cond = (hits[lang] > 0)
        for o in others:
            cond = cond & (hits[lang] >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings: positions 0..len−n joined by space."""
    return F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
    )


def min_shingle_hash(tokens: Column, n: int = 3) -> Column:
    """Rolling-shingle document fingerprint: lexicographic min of the md5
    hashes of all word n-grams — a winnowing-style signature; documents
    sharing any minimal shingle collide."""
    return F.array_min(F.transform(shingles(tokens, n), F.md5))


def top_gram_mass(grams: Column) -> Column:
    """Fraction of gram occurrences taken by the single most frequent gram —
    the Gopher/MassiveText repetition signal (a page whose top 2-gram exceeds
    ~20% of 2-gram mass is boilerplate/spam-like).

    Pure JVM higher-order folds: counts = for each DISTINCT gram, how many
    positions equal it — O(|distinct|·|grams|) per row with zero Python.
    PASS A MATERIALIZED COLUMN: Catalyst does no CSE inside lambda bodies, so
    handing this an inline shingle-construction expression re-builds the gram
    array once per distinct element (measured 10× slower); project the gram
    array to a named column first and the lambda binds a cheap attribute.
    Right-sized for web-page-scale docs (≤ ~10⁴ tokens); for book-length
    rows, explode + groupBy (the ``token_frequencies`` shape) bounds the
    per-row cost instead. NULL for empty gram arrays."""
    counts = F.transform(
        F.array_distinct(grams), lambda d: F.size(F.filter(grams, lambda g: g == d))
    )
    return F.array_max(counts).cast("double") / F.size(grams)


def dup_gram_frac(grams: Column) -> Column:
    """Fraction of gram occurrences that are repeats of an earlier one:
    1 − distinct/total. 0 = no internal repetition; →1 = the document loops.
    The within-doc complement of cross-doc dedup. NULL for empty arrays."""
    return (
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    )


def top_ngram_mass(tokens: Column, n: int = 2) -> Column:
    """``top_gram_mass`` over the token array's n-gram shingles. Convenience
    form for ad-hoc use — in a query, prefer projecting ``shingles(...)`` to
    a column and calling ``top_gram_mass`` on it (see that docstring's CSE
    note)."""
    return top_gram_mass(shingles(tokens, n))


def dup_ngram_frac(tokens: Column, n: int = 3) -> Column:
    """``dup_gram_frac`` over the token array's n-gram shingles."""
    return dup_gram_frac(shingles(tokens, n))


def bag_fingerprint(tokens: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token bag. Two documents with the same vocabulary collide — the cheap
    first-stage signal for near-dup candidate generation."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens))))
