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
