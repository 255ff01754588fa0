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

# A small English stopword list used by quality scoring and language-ID.
# Public-knowledge list (most frequent function words).
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "with", "by", "at", "as", "it", "that",
)


def tokenize(col: Column | str) -> Column:
    """Lowercase whitespace tokens. Mirror: ``string_split(lower(x), ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


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


def bag_fingerprint(tokens: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token bag. Two documents with the same vocabulary collide — the cheap
    first-stage signal for near-dup candidate generation."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens))))
