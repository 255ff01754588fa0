"""Distributed BPE (byte-pair-encoding) tokenizer training and encoding.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with Subword
Units") — the algorithm behind GPT-2/RoBERTa-style tokenizers, restructured
for Spark's execution model instead of the usual single-machine trainer:

* **Corpus-sized work happens exactly once.** The only pass over corpus
  bytes is the word-frequency aggregation (one explode + one shuffle whose
  payload is (word, count)). Everything after — every merge iteration, the
  encode table — operates on the *distinct-word vocabulary*, which is
  orders of magnitude smaller than the corpus at any scale (Heaps' law);
  at 100 TB the vocab is a few tens of millions of rows, a small DataFrame.
* **Merge iterations are vocab-sized DataFrame aggs.** Each iteration
  counts adjacent symbol pairs weighted by word frequency (slice + zip +
  explode — pure JVM), takes the arg-max pair with a total deterministic
  tiebreak (count DESC, then pair lexicographic), and rewrites the vocab's
  symbol arrays with a JVM ``aggregate`` fold — the same greedy
  left-to-right, non-overlapping replacement the reference algorithm's
  ``re.sub`` performs. One driver round-trip per merge carries ONE row (the
  winning pair) — the k-means-centroid pattern, model-sized traffic only.
  Lineage is localCheckpoint-truncated every few merges so the plan does
  not grow linearly with the merge count.
* **Encoding is vocab-sized Python, corpus-sized join.** Applying ~10k
  learned merges per token is irreducibly iterative, so it runs as an
  Arrow-batched pandas UDF — but over the DISTINCT words only, with the
  merge ranks broadcast; the corpus then picks up its piece arrays by
  joining tokens to the encoded vocab (AQE broadcasts the vocab side when
  it fits). Corpus text is never touched by Python.

The within-word fold cannot chain through its own output (the merged symbol
``a+b`` can never equal the pattern's left element ``a`` since ``b`` is
non-empty), so the JVM fold and the reference's sequential ``re.sub`` agree
symbol-for-symbol; ``tests/test_bpe.py`` proves parity against an
independent pure-Python Sennrich implementation on a real corpus sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "train_bpe", "encode_with_merges"]

_END = "</w>"  # end-of-word marker, per the reference algorithm


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus-sized pass: (word, n) for every distinct
    whitespace-token. Map-side partial aggregation collapses within-partition
    repeats before the one shuffle."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """A word's initial symbol sequence: its characters, then the
    end-of-word marker (so 'low' and 'lowest' can share a prefix but word
    ends stay distinguishable — the reference's representation)."""
    return F.concat(F.split(word, ""), F.array(F.lit(_END)))


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (left, right)
    into left||right, as a JVM fold — no Python in the loop."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus. Returns the ordered merge
    list — the model, a few KB, driver-sized by definition (like k-means
    centroids). Stops early if no adjacent pair occurs twice."""
    vocab = word_frequencies(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("sym"), "n"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            vocab.filter(F.size("sym") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("sym", 1, F.size("sym") - 1).alias("a"),
                        F.slice("sym", 2, F.size("sym") - 1).alias("b"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("freq"))
        )
        top = pairs.orderBy(F.desc("freq"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["freq"] < 2:
            break
        left, right = top[0]["a"], top[0]["b"]
        merges.append((left, right))
        vocab = vocab.select(_merge_pair(F.col("sym"), left, right).alias("sym"), "n")
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Reference encode: repeatedly merge the lowest-rank adjacent pair."""
    sym = list(word) + [_END]
    while len(sym) >= 2:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        sym[best : best + 2] = [sym[best] + sym[best + 1]]
    return sym


def encode_with_merges(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize a corpus with a learned merge table: (doc_id, word, word_idx,
    pieces). Python runs only over DISTINCT words (the vocab); the corpus
    picks its piece arrays up through a token→vocab join that AQE broadcasts
    when the encoded vocab fits."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    spark = docs.sparkSession
    rank_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    # No type hints on the UDF body: module-level `from __future__ import
    # annotations` stringifies them and pyspark's hint resolver chokes.
    def _encode_series(words):
        rank = rank_bc.value
        return words.map(lambda w: _encode_word(w, rank))

    encode_udf = F.pandas_udf(_encode_series, ArrayType(StringType()))

    tokens = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("word_idx", "word"),
    ).filter(F.col("word") != "")
    vocab = tokens.select("word").distinct().select(
        "word", encode_udf("word").alias("pieces")
    )
    return tokens.join(vocab, "word").select("doc_id", "word_idx", "word", "pieces")
