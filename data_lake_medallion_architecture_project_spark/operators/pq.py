"""Product quantization (PQ) — compressed-domain ANN, the memory tier of
the similarity ladder (brute → IVF → IVF+PQ).

PQ [Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011] splits a d-dim vector into M subvectors and quantizes
each against its own K-word codebook: a vector becomes M small codes
(here 8×4 bits = 8 bytes vs 64 float64s = 512 bytes, 64×), and query↔code
distances come from M table lookups instead of d multiplies (ADC —
asymmetric distance computation).

The cross-engine twist here: vectors and codebooks live on an INTEGER
lattice (coordinates scaled by 10⁶ and rounded), so every subspace
distance Σ(x_i−c_i)² and every ADC sum is exact int64 arithmetic — argmin
assignment, shortlist membership, and shortlist order are bit-identical
in ANY engine, with no float-tie margin guard needed (the IVF path's
pinned-model caveat disappears; genuinely equal distances break on the
code index, which is replayable too).

Scale shape: encoding is one Arrow-batched map-only pass (int64 numpy,
codebooks closure-broadcast: M·K·dsub ints); the encoded corpus is
M bytes/vector and never re-reads the raw embeddings; queries broadcast
their M×K distance TABLES (ints), scoring is a JVM-side zip/fold over the
codes, and only the per-query top-L shortlist pays a (tiny, keyed) window
shuffle. The exact rerank touches raw vectors for |Q|·L rows only — the
standard IVF-PQ serving shape at billion-vector scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from ..functions.vectors import cosine, l2_norm, to_double_array

PQ_M = 8          # subspaces
PQ_K = 16         # codewords per subspace (4-bit codes)
PQ_SCALE = 10**6  # integer lattice: coord = round(x * PQ_SCALE)


def int_lattice(vec_col) -> "F.Column":
    """The exact integer-lattice view of an embedding: float32 → double is
    exact, round(x·10⁶) → long is the shared quantization both engines
    replay digit-for-digit."""
    return F.transform(
        to_double_array(vec_col),
        lambda x: F.round(x * PQ_SCALE).cast("long"),
    )


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    seed: int = 42,
    sample_limit: int = 4096,
    n_iters: int = 8,
) -> np.ndarray:
    """Deterministic per-subspace L2 k-means on a bounded TakeOrdered sample
    (same sampling contract as train_ivf_centroids: xxhash64 order breaks
    ingest clustering, id re-sort stabilizes the init). Returns int64
    codebooks of shape (m, k, d/m) — centroids rounded onto the lattice, so
    the TRAINED model is already in exact arithmetic."""
    rows = sorted(
        corpus.select(F.col(id_col).alias("i"), to_double_array(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i"), F.lit(seed)), F.col("i"))
        .limit(sample_limit)
        .collect(),
        key=lambda r: r["i"],
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by M={m}"
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        s = x[:, j * dsub : (j + 1) * dsub]
        cent = s[rng.choice(len(s), size=min(k, len(s)), replace=False)].copy()
        for _ in range(n_iters):
            d2 = ((s[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first-min-wins, like the lattice
            for c in range(len(cent)):
                members = s[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(np.round(cent * PQ_SCALE).astype(np.int64))
    return np.stack(books)  # (m, k, dsub)


def _encode_udf(books: np.ndarray):
    """codes[m] = argmin_k Σ(x−c)² on the int lattice — exact int64 numpy,
    first-min-wins ties (≡ lexicographic (distance, code) min). Input is the
    ALREADY-integer lattice column (``int_lattice``): the one rounding step
    happens JVM-side with the same round() semantics the oracle uses, so
    numpy never touches a float."""
    m, _, dsub = books.shape

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            x = np.array(s.tolist(), dtype=np.int64)
            out = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]  # (n, dsub) int64
                diff = sub[:, None, :] - books[j][None, :, :]
                d2 = (diff * diff).sum(axis=2)  # exact int64
                out[:, j] = np.argmin(d2, axis=1)
            yield pd.Series(list(out))

    return encode


def _qtable_udf(books: np.ndarray):
    """Per-query ADC table: flat array of M·K exact int64 distances,
    table[m·K + k] = Σ(q_sub − c_mk)²."""
    m, k, dsub = books.shape

    @F.pandas_udf(ArrayType(LongType()))
    def qtable(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            x = np.array(s.tolist(), dtype=np.int64)
            n = len(x)
            tab = np.empty((n, m * k), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                diff = sub[:, None, :] - books[j][None, :, :]
                tab[:, j * k : (j + 1) * k] = (diff * diff).sum(axis=2)
            yield pd.Series(list(tab))

    return qtable


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 32,
) -> DataFrame:
    """IVF-PQ-style serving: ADC shortlist (exact-int, top-``shortlist`` per
    query by quantized distance, ties on cid) + exact cosine rerank of the
    shortlist to top-``k``. Output contract (qid, cid, rank) matches
    brute_force_topk/ivf_topk, so the three tiers swap freely.

    The corpus side is encoded once (map-only Arrow pass) and scored
    against broadcast query TABLES with a JVM zip/fold over the M codes —
    the raw embedding column is read again only for the |Q|·shortlist
    rerank rows."""
    kk = books.shape[1]
    enc = _encode_udf(books)
    qt = _qtable_udf(books)

    c = corpus.select(
        F.col(id_col).alias("cid"),
        enc(int_lattice(vec_col)).alias("codes"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), qt(int_lattice(vec_col)).alias("qtab")
        )
    )
    # adc = Σ_m qtab[m*K + codes[m]] — all longs, JVM higher-order fold.
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(books.shape[0] - 1)),
            lambda code, j: F.element_at(
                F.col("qtab"), (j * kk + code + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("cid"))
    short = (
        c.join(q, F.col("qid") != F.col("cid"))
        .select("qid", "cid", adc.alias("adc"))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= shortlist)
        .select("qid", "cid")
    )
    cv = corpus.select(
        F.col(id_col).alias("cid"), to_double_array(vec_col).alias("cvec")
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), to_double_array(vec_col).alias("qvec")
        ).withColumn("qnorm", l2_norm(F.col("qvec")))
    )
    rer = (
        short.join(cv, "cid")
        .join(qv, "qid")
        .select(
            "qid",
            "cid",
            cosine(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        rer.select("qid", "cid", F.row_number().over(w2).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )


def _probe_udf(cent: np.ndarray, n_probe: int):
    """Per-query n_probe nearest IVF centroids (stable argsort of normalized
    dots — the same probe contract as operators/similarity.ivf_topk)."""

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_centroids(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            x = np.array(s.tolist(), dtype=np.float64)
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.where(norms == 0, 1.0, norms)
            order = np.argsort(-(x @ cent.T), axis=1, kind="stable")
            yield pd.Series(list(order[:, :n_probe].astype("int32")))

    return probe_centroids


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 6,
    shortlist: int = 32,
) -> DataFrame:
    """The composed IVF-PQ serving stack [Jégou et al. TPAMI 2011, §V]:
    IVF partition pruning shrinks WHICH codes are scanned (n_probe/
    n_centroids of the corpus), PQ shrinks what a scanned row COSTS
    (8-byte codes, table-lookup distances), and the exact cosine rerank
    repairs both approximations inside the |Q|·shortlist window. With
    n_probe = n_centroids this equals ``pq_topk`` exactly (tested) — the
    pruning composes orthogonally.

    At 100 TB the corpus is written bucketed by centroid with codes
    precomputed (write_ivf_bucketed's layout plus a codes column), so a
    probe is a partition-pruned scan of code columns only."""
    from .similarity import _assign_udf

    cent = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(cent))
    kk = books.shape[1]
    enc = _encode_udf(books)
    qt = _qtable_udf(books)

    c = corpus.select(
        F.col(id_col).alias("cid"),
        _assign_udf(cent)(F.col(vec_col)).alias("centroid"),
        enc(int_lattice(vec_col)).alias("codes"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            qt(int_lattice(vec_col)).alias("qtab"),
            F.explode(_probe_udf(cent, n_probe)(F.col(vec_col))).alias("centroid"),
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(books.shape[0] - 1)),
            lambda code, j: F.element_at(
                F.col("qtab"), (j * kk + code + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("cid"))
    short = (
        c.join(q, "centroid")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", adc.alias("adc"))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= shortlist)
        .select("qid", "cid")
    )
    cv = corpus.select(
        F.col(id_col).alias("cid"), to_double_array(vec_col).alias("cvec")
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), to_double_array(vec_col).alias("qvec")
        ).withColumn("qnorm", l2_norm(F.col("qvec")))
    )
    rer = (
        short.join(cv, "cid")
        .join(qv, "qid")
        .select(
            "qid",
            "cid",
            cosine(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        rer.select("qid", "cid", F.row_number().over(w2).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )
