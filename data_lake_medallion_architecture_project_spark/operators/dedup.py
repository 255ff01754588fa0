"""Deduplication operators for large-scale document corpora.

Three tiers, increasing recall / cost:

* ``exact_dedup`` — content-hash groupBy. One shuffle on a 128-bit hash;
  at 100 TB this is the cheapest possible dedup (hash is computed map-side,
  shuffle carries only (hash, id)).
* ``jaccard_similar_pairs`` — exact token-set Jaccard via an inverted-index
  self-join (explode tokens → join on token → count intersections). Exact but
  quadratic in posting-list length; at scale, run it *after* LSH candidate
  generation, not on the full corpus.
* ``minhash_near_dup`` — MinHash + banded LSH. Deterministic seeded hash
  family (xxhash64 of seed-prefixed tokens), so signatures are reproducible
  across runs/executors. Candidates from band-bucket joins, then exact Jaccard
  verification of the (few) candidates. This is the 100 TB scale path: cost is
  O(n · perms) map-side plus a shuffle keyed on (band, bucket).

The reference implements only whole-row drop_duplicates
(``/root/reference/pipeline/bronze_to_silver.py:54-56``, D1-D3 in SURVEY.md);
everything here is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Group rows by content hash; emit one canonical id + duplicate count per
    distinct content. Deterministic canonical choice: min id."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokenize(text_col)).alias("tokens"),
    )


def jaccard_similar_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Exact word-set Jaccard pairs ≥ threshold via inverted-index self-join.

    Plan shape: explode distinct tokens → shuffle on token → pairwise counts →
    join back the set sizes (broadcast — one row per doc id). Returns
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    sets = _token_sets(df, id_col, text_col)
    sizes = sets.select("id", F.size("tokens").alias("set_size"))
    postings = sets.select("id", F.explode("tokens").alias("token"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    jaccard = F.col("intersection") / (
        F.col("size_a") + F.col("size_b") - F.col("intersection")
    )
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_signature(tokens: Column, num_perms: int) -> Column:
    """num_perms MinHash values: for perm i, min over tokens of
    xxhash64("i|" + token). Seeded by prefix → deterministic everywhere."""
    return F.array(
        *[
            F.array_min(
                F.transform(tokens, lambda t, i=i: F.xxhash64(F.concat(F.lit(f"{i}|"), t)))
            )
            for i in range(num_perms)
        ]
    )


def minhash_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perms: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified.

    bands × rows = num_perms; with (32, 8) the S-curve crosses ~0.55 — callers
    verifying at threshold ≥ 0.6 get high recall. Candidate generation shuffles
    (band, bucket, id) only; signatures never leave the map side.
    """
    if num_perms % bands != 0:
        raise ValueError("bands must divide num_perms")
    rows = num_perms // bands
    sets = _token_sets(df, id_col, text_col).filter(F.size("tokens") > 0)
    sig = sets.select("id", "tokens", _minhash_signature(F.col("tokens"), num_perms).alias("sig"))
    # One row per (band, bucket-hash, id): bucket hash = md5 of the band slice.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(F.concat_ws(",", F.slice("sig", b * rows + 1, rows))).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Exact verification of the candidate pairs only.
    ta = sets.select(F.col("id").alias("id_a"), F.col("tokens").alias("tokens_a"))
    tb = sets.select(F.col("id").alias("id_b"), F.col("tokens").alias("tokens_b"))
    inter = F.size(F.array_intersect("tokens_a", "tokens_b"))
    union = F.size(F.array_union("tokens_a", "tokens_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
