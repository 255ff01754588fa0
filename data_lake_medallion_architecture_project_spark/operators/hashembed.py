"""Feature-hashing ("hashing trick") document embeddings — text → fixed-dim
vectors with NO external embedder, no vocabulary, no model state.

Weinberger et al., ICML 2009 ("Feature Hashing for Large Scale Multitask
Learning"): each token hashes to one of ``dim`` buckets with a ±1 sign from
an independent hash bit; a document's vector is the signed token-count per
bucket. Inner products are unbiased estimates of the underlying
bag-of-words inner products, which is what makes the output usable by every
embedding-space operator in this repo (``semdedup_prune``, ``ivf_topk``,
``blocked_cosine_pairs``) when a learned embedding table isn't available.

Scale shape: one tokenize pass → (doc, bucket) aggregate (map-side
combinable; the key space is |docs|·dim, never the vocabulary) → per-doc
map assembly. Everything is JVM column expressions in whole-stage codegen —
no Python, no UDF, no shuffle beyond the one (doc, bucket) exchange.

Hash families (the repo-wide dual-family discipline, see operators/dedup.py):
``xxhash64`` for production, ``md5`` for the cross-engine-replayable gate —
bucket = first 8 md5 hex chars mod dim, sign = high bit of the 9th hex char,
all exact integers a DuckDB oracle recomputes (the registry query
``doc_hash_embedding_buckets`` hash-certifies the long form).

Reference parity: the reference has no text vectorizer; this supplies the
documents→vector bridge its corpus would need before any semantic operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def _bucket_and_sign(tok: Column, dim: int, hash_family: str) -> tuple[Column, Column]:
    if hash_family == "md5":
        h = F.md5(tok)
        bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).cast("int")
        sign = F.when(
            F.substring(h, 9, 1).isin(*_HEX_HIGH), F.lit(1)
        ).otherwise(F.lit(-1))
    elif hash_family == "xxhash64":
        bucket = F.pmod(F.xxhash64(tok), F.lit(dim)).cast("int")
        sign = F.when(
            F.pmod(F.xxhash64(F.lit("s|"), tok), F.lit(2)) == 0, F.lit(1)
        ).otherwise(F.lit(-1))
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    return bucket, sign


def hash_embed_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Long form: (id, bucket, signed_count) — exact integers, the shape the
    DuckDB gate certifies. Buckets with zero net count are absent."""
    bucket, sign = _bucket_and_sign(F.col("tok"), dim, hash_family)
    return (
        docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
        .select(id_col, bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("long").alias("signed_count"))
        .filter(F.col("signed_count") != 0)
    )


def hash_embed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Dense form: (id, embedding array<double> of length ``dim``) —
    assembled from the long form with zeros filled in, ready for the
    embedding-space operators (cosine treats the signed counts as
    coordinates; callers needing unit vectors divide by the L2 norm, a
    float operation on identical integers in any engine).

    Output cardinality EQUALS the distinct input ids: a document with no
    tokens, or whose buckets all cancel (two tokens in one bucket with
    opposite signs), gets the ZERO vector rather than vanishing — the long
    form drops its rows, and a silent absence would make downstream per-doc
    operators (semdedup_prune, ivf_topk) never see the document."""
    long_form = hash_embed_buckets(docs, id_col, text_col, dim, hash_family)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("signed_count")))
    )
    assembled = long_form.groupBy(id_col).agg(m.alias("m"))
    ids = docs.select(id_col).distinct()
    # element_at on the NULL map (id with no surviving buckets) is null →
    # coalesce fills the whole vector with zeros.
    return ids.join(assembled, id_col, "left").select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda b: F.coalesce(
                F.element_at(F.col("m"), b.cast("int")), F.lit(0)
            ).cast("double"),
        ).alias("embedding"),
    )
