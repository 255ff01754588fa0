"""Property tests for the dedup and similarity operators."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.dedup import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_near_dup,
)
from data_lake_medallion_architecture_project_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox leaps over the lazy dog",  # near dup of 0
        "completely different content about spark engines",
        "spark engines about content different completely",  # permutation of 3
        "a totally unrelated sentence with unique words here",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_groups_identical_content(docs):
    out = {r["canonical_id"]: r["dup_count"] for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert out[0] == 2  # docs 0 and 1 share a hash, canonical = min id
    assert 1 not in out
    assert sum(out.values()) == 6


def test_exact_dedup_idempotent(docs):
    once = exact_dedup(docs, "doc_id", "text")
    again = exact_dedup(
        once.selectExpr("canonical_id as doc_id", "content_hash as text"), "doc_id", "text"
    )
    assert again.count() == once.count()


def test_jaccard_pairs_find_near_duplicates(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert pairs[(0, 2)] >= 0.7  # one-word swap
    assert pairs[(3, 4)] == 1.0  # word permutation, same set
    assert not any({a, b} == {0, 3} for a, b in pairs)


def test_prefix_filter_identical_to_naive_join(spark):
    """The prefix-filter lemma makes pruning exact: candidate generation over
    rarest-token prefixes plus full-set verification must reproduce the naive
    full inverted-index join bit-for-bit on a real corpus (500 docs, ~90k
    qualifying pairs — near-dup dense, so a recall loss would be visible)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pruned = sorted(
        map(tuple, jaccard_similar_pairs(docs, "doc_id", "text", 0.5).collect())
    )
    naive = sorted(
        map(
            tuple,
            jaccard_similar_pairs(
                docs, "doc_id", "text", 0.5, prefix_filter=False
            ).collect(),
        )
    )
    assert pruned == naive
    assert len(pruned) > 0


def test_positional_filter_keeps_exact_boundary_pair(spark):
    """PPJoin positional-filter boundary (round 15): a pair whose overlap
    upper bound c + min(|A|−i*, |B|−j*) EQUALS the minimum required overlap
    ⌈t·(|A|+|B|)/(1+t)⌉, with true Jaccard exactly t, must survive the
    filter — the 1e-9 slack exists precisely so double rounding of
    t/(1+t)·(|A|+|B|) can never prune a qualifying pair. Sets are built so
    the shared rare tokens are split across prefix/suffix: A={x,u,v},
    B={y,u,v} under rarest-first order gives prefixes {x,u}/{y,u}, one
    common prefix token (c=1, i*=j*=2), bound 1+min(1,1)=2, alpha
    0.5/1.5·6=2, J=2/4=0.5."""
    from data_lake_medallion_architecture_project_spark.operators.dedup import (
        jaccard_pairs_from_sets,
    )

    sets = spark.createDataFrame(
        [(0, ["x", "u", "v"]), (1, ["y", "u", "v"])],
        "id long, tokens array<string>",
    )
    rows = jaccard_pairs_from_sets(sets, 0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(0, 1)]
    assert rows[0]["jaccard"] == 0.5


def test_minhash_matches_exact_jaccard_on_high_threshold(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(docs, "doc_id", "text", threshold=0.9).collect()
    }
    # LSH verification step makes precision exact; recall may drop pairs whose
    # bands all miss, but identical sets always collide in every band.
    assert approx <= exact
    assert (0, 1) in approx and (3, 4) in approx


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(df.filter(F.col("vec_id") < 3), df, k=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rank"], r["cid"]))

    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for qid in range(3):
        cos = (v @ v[qid]) / (norms * norms[qid])
        order = [
            int(i)
            for i in sorted(range(30), key=lambda i: (-cos[i], i))
            if i != qid
        ][:4]
        expect = [(rank + 1, cid) for rank, cid in enumerate(order)]
        assert sorted(got[qid]) == expect


def test_topk_rank_bounds(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<float>"
    )
    out = brute_force_topk(df.limit(2), df, k=3).toPandas()
    assert out.groupby("qid")["rank"].max().le(3).all()
    assert (out.qid != out.cid).all()


def test_ivf_full_probe_equals_brute_force(spark):
    from data_lake_medallion_architecture_project_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 5)
    exact = sorted(tuple(r) for r in brute_force_topk(q, df, k=4).collect())
    # n_probe == n_centroids → no pruning → must be IDENTICAL to brute force.
    full = sorted(
        tuple(r)
        for r in ivf_topk(q, df, k=4, n_centroids=8, n_probe=8).collect()
    )
    assert full == exact


def test_ivf_pruned_recall(spark):
    from data_lake_medallion_architecture_project_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["qid"], r["cid"]) for r in brute_force_topk(q, emb, k=5).collect()
    }
    approx = {
        (r["qid"], r["cid"])
        for r in ivf_topk(q, emb, k=5, n_centroids=16, n_probe=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    # determinism: same inputs, same centroids, same answer
    approx2 = {
        (r["qid"], r["cid"])
        for r in ivf_topk(q, emb, k=5, n_centroids=16, n_probe=12).collect()
    }
    assert approx == approx2


def test_ivf_pinned_model_recall(spark):
    """The registry's oracle-replayable shape — probing the pinned k=8 model
    with n_probe=6 — must still be a usable ANN, not just hash-reproducible."""
    from data_lake_medallion_architecture_project_spark.operators.similarity import ivf_topk
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )

    # sf0.01 is the corpus the pinned model was fit on (the gate scale);
    # out-of-domain corpora probe worse (measured 0.85 at sf0.001) — refit
    # via tools/pin_centroids.py when the target corpus changes.
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["qid"], r["cid"]) for r in brute_force_topk(q, emb, k=5).collect()
    }
    approx = {
        (r["qid"], r["cid"])
        for r in ivf_topk(
            q, emb, k=5, n_probe=6, centroids=_CLUSTER_CENTROIDS_K8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_frame_sampling_explodes_and_matches_arithmetic(spark):
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        attach_text_payloads,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 2600), (3, "c" * 256)],
        "doc_id long, text string",
    )
    frames = sample_frames(attach_text_payloads(docs), frame_size=256, stride=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 bytes < frame → 1 partial frame of 100 bytes
    assert len(by_doc[1]) == 1 and len(by_doc[1][0]["frame_payload"]) == 100
    # doc 2: 2600//256 = 10 frames, stride 4 → idx 0,4,8, each full 256
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 4, 8]
    assert all(len(r["frame_payload"]) == 256 for r in by_doc[2])
    # doc 3: exactly one full frame
    assert len(by_doc[3]) == 1 and len(by_doc[3][0]["frame_payload"]) == 256


def test_minhash_keep_list_contract(spark, docs):
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY
    import tempfile, os

    # Route the registry query at a tiny parquet corpus built from the fixture.
    with tempfile.TemporaryDirectory() as d:
        docs.select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("t").alias("source"), F.length("text").alias("n_chars"),
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r["keep_id"]
            for r in REGISTRY["minhash_dedup_keep_list"].build(spark, d).collect()
        }
    assert set(out) == {0, 1, 2, 3, 4, 5}          # one row per doc
    assert all(k <= i for i, k in out.items())      # canonical is the min id
    assert out[1] == 0                              # exact dup folds to 0
    assert out[4] == 3                              # permutation folds to 3
    assert out[5] == 5                              # unique doc keeps itself


def test_cosine_lsh_finds_planted_near_dups(spark):
    from data_lake_medallion_architecture_project_spark.operators.similarity import cosine_lsh_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16)).astype(np.float64)
    vecs = list(base)
    # Plant near-duplicates: ids 40..49 are ids 0..9 plus tiny noise.
    for i in range(10):
        vecs.append(base[i] + rng.normal(scale=0.01, size=16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_lsh_pairs(df, threshold=0.95).collect()}
    planted = {(i, 40 + i) for i in range(10)}
    # Recall: every planted pair found (≈0.999 per-pair probability at these
    # LSH params and cosine ≈ 0.9999).
    assert planted <= pairs, planted - pairs
    # Precision is exact by construction (candidates verified with true
    # cosine); random 16-dim pairs essentially never reach 0.95.
    assert pairs == planted or len(pairs - planted) <= 1


def test_blocked_cosine_pairs_equals_crossjoin_exact(spark):
    from data_lake_medallion_architecture_project_spark.operators.similarity import blocked_cosine_pairs

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 12)).astype(np.float32)
    # Plant three near-duplicate pairs so the ≥-threshold set is non-trivial.
    vecs[70] = vecs[10] + rng.normal(scale=0.01, size=12).astype(np.float32)
    vecs[71] = vecs[20] + rng.normal(scale=0.01, size=12).astype(np.float32)
    vecs[72] = vecs[30] * 1.5
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )

    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    sim = (v @ v.T) / np.outer(norms, norms)
    expect = {
        (i, j) for i in range(80) for j in range(i + 1, 80) if sim[i, j] >= 0.4
    }
    assert len(expect) >= 3  # the planted pairs at minimum

    for n_blocks in (1, 3, 8):
        got = {
            (r["id_a"], r["id_b"])
            for r in blocked_cosine_pairs(df, threshold=0.4, n_blocks=n_blocks).collect()
        }
        assert got == expect, f"n_blocks={n_blocks}"


def test_ivf_bucketed_index_matches_in_memory_and_prunes(spark, tmp_path):
    """The materialized IVF layout must return exactly what in-memory
    ivf_topk returns for the same (centroids, n_probe), and its corpus scan
    must touch ONLY the probed centroid directories."""
    from data_lake_medallion_architecture_project_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_bucketed,
        write_ivf_bucketed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf_index")
    write_ivf_bucketed(emb, idx, n_centroids=16, seed=42)

    mem = sorted(
        tuple(r) for r in ivf_topk(q, emb, k=5, n_centroids=16, n_probe=4).collect()
    )
    bucketed_df = ivf_topk_bucketed(q, idx, k=5, n_probe=4)
    bucketed = sorted(tuple(r) for r in bucketed_df.collect())
    assert bucketed == mem

    # Pruning proof: the probed-bucket restriction must land in the scan's
    # PartitionFilters (directory prune), not a post-scan row filter.
    import contextlib
    import io

    probed_corpus = spark.read.parquet(idx).filter(F.col("centroid").isin([0, 1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed_corpus.explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert pf and "centroid" in pf[0], buf.getvalue()
    # Full-probe sanity: index probe at n_probe=16 equals brute force.
    full = sorted(
        tuple(r) for r in ivf_topk_bucketed(q, idx, k=5, n_probe=16).collect()
    )
    exact = sorted(tuple(r) for r in brute_force_topk(q, emb, k=5).collect())
    assert full == exact


def test_quantization_error_bound_and_roundtrip(spark):
    """int8 quantization invariants: max reconstruction error ≤ scale/2 for
    every vector (the floor(x+0.5) nearest-int bound), scale > 0 for any
    nonzero vector, and quantized codes stay inside [-127, 127]."""
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    rows = REGISTRY["embedding_quantization_error"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["scale"] >= 0
        # strict half-scale bound with an ulp of slack for the IEEE division
        assert r["max_abs_err"] <= r["scale"] / 2 * (1 + 1e-12), r

    # Explicit roundtrip on a known vector: codes and reconstruction match
    # a numpy reference of the same formula.
    import numpy as np

    v = np.array([0.5, -1.27, 0.003, 1.27])
    scale = np.abs(v).max() / 127.0
    q = np.floor(v / scale + 0.5)
    assert q.max() <= 127 and q.min() >= -127
    assert np.max(np.abs(v - q * scale)) <= scale / 2


def test_minhash_hash_families_agree_on_verified_output(spark):
    """The two permutation families (xxhash64 production / md5 replayable)
    bucket candidates differently but both feed the same exact verifier;
    at 32 perms x 8 bands and threshold 0.9 their recall saturates, so the
    VERIFIED pair sets must coincide on the gate corpus (also measured
    equal at sf0.1: 964,854 pairs each)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {}
    for fam in ("xxhash64", "md5"):
        out[fam] = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_dup(
                docs, "doc_id", "text", threshold=0.9, num_perms=32, bands=8,
                hash_family=fam,
            ).collect()
        }
    assert out["xxhash64"] == out["md5"]


# --------------------------------------------------------------------------- #
# Product quantization.
# --------------------------------------------------------------------------- #


def test_pq_pinned_codebooks_match_fresh_fit(spark):
    """Drift guard: the pinned integer codebooks must equal a fresh
    deterministic fit on the gate corpus (same contract as the IVF pin)."""
    from data_lake_medallion_architecture_project_spark.operators.pq import train_pq_codebooks
    from data_lake_medallion_architecture_project_spark.plans._pinned_pq import _PQ_CODEBOOKS_M8_K16

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    fresh = train_pq_codebooks(emb)
    assert fresh.tolist() == _PQ_CODEBOOKS_M8_K16


def test_pq_shortlist_is_exact_lattice_l2(spark):
    """With codebooks whose codewords ARE the corpus subvectors (K covers
    every distinct pattern), ADC equals exact lattice L2 — so the final
    ranks must equal a numpy replication of exact-L2 shortlist + cosine
    rerank, shortlist < corpus (non-vacuous pruning)."""
    from data_lake_medallion_architecture_project_spark.operators.pq import (
        PQ_SCALE,
        pq_topk,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(16, 16)).astype(np.float32)  # 16 DISTINCT vectors
    n = len(vecs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    # K = corpus size and the sample covers everything: k-means converges to
    # one codeword per subvector pattern, so quantization is LOSSLESS here.
    books = train_pq_codebooks(df, m=4, k=16, sample_limit=64)
    out = pq_topk(
        df.filter(F.col("vec_id") < 3), df, books, k=3, shortlist=10
    ).collect()

    scaled = vecs.astype(np.float64) * PQ_SCALE
    # Away-from-zero half rounding — F.round's semantics, not rint's half-even.
    lat = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rank"], r["cid"]))
    for qid in range(3):
        d2 = ((lat - lat[qid]) ** 2).sum(axis=1)
        cand = [(d2[c], c) for c in range(n) if c != qid]
        short = [c for _, c in sorted(cand)[:10]]
        x = vecs.astype(np.float64)
        cos = x @ x[qid] / (np.linalg.norm(x, axis=1) * np.linalg.norm(x[qid]))
        rer = sorted(short, key=lambda c: (-cos[c], c))[:3]
        assert [c for _, c in sorted(got[qid])] == rer


def test_pq_registry_recall_floor(spark):
    """The oracle-replayable registry shape must stay a usable ANN: recall@5
    vs brute force ≥ 0.6 on the near-isotropic gate corpus (PQ's worst
    case — the ADC shortlist uses unnormalized L2 while the target metric
    is cosine; the exact rerank repairs the metric inside the shortlist)."""
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["qid"], r["cid"])
        for r in REGISTRY["similarity_topk"].build(spark, sf).collect()
    }
    pq = {
        (r["qid"], r["cid"])
        for r in REGISTRY["pq_similarity_topk"].build(spark, sf).collect()
    }
    assert len(brute & pq) / len(brute) >= 0.6


def test_ivfpq_full_probe_equals_pq(spark):
    """Pruning composes orthogonally: probing ALL IVF partitions makes the
    candidate set identical to the plain PQ scan, so the outputs must be
    EQUAL — any divergence means the pruning leaked into the scoring."""
    from data_lake_medallion_architecture_project_spark.operators.pq import ivfpq_topk, pq_topk
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )
    from data_lake_medallion_architecture_project_spark.plans._pinned_pq import _PQ_CODEBOOKS_M8_K16

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    books = np.array(_PQ_CODEBOOKS_M8_K16, dtype=np.int64)
    plain = sorted(tuple(r) for r in pq_topk(q, emb, books, k=5, shortlist=32).collect())
    full = sorted(
        tuple(r)
        for r in ivfpq_topk(
            q, emb, _CLUSTER_CENTROIDS_K8, books, k=5, n_probe=8, shortlist=32
        ).collect()
    )
    assert full == plain


def test_ivfpq_registry_recall_floor(spark):
    """The composed registry shape carries BOTH approximations (partition
    pruning + quantized shortlist); it must still clear recall@5 >= 0.5 vs
    brute force on the worst-case isotropic corpus."""
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["qid"], r["cid"])
        for r in REGISTRY["similarity_topk"].build(spark, sf).collect()
    }
    both = {
        (r["qid"], r["cid"])
        for r in REGISTRY["ivfpq_similarity_topk"].build(spark, sf).collect()
    }
    assert len(brute & both) / len(brute) >= 0.5


def test_dimension_stats_match_numpy(spark):
    """Lattice-exact per-dimension moments must agree with float64 numpy to
    quantization precision (1e-6 lattice -> ~1e-6 on mean, ~1e-5 on var)."""
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    x = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    out = {
        r["dim"]: r
        for r in REGISTRY["embedding_dimension_stats"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert len(out) == x.shape[1]
    for d in range(x.shape[1]):
        r = out[d + 1]
        assert r["n"] == len(x)
        assert abs(r["mean"] - x[:, d].mean()) < 1e-5
        assert abs(r["variance"] - x[:, d].var()) < 1e-4


def test_semdedup_matches_numpy_triangular_rule(spark):
    """SemDeDup keep-list replayed in numpy: assign each vector to the pinned
    centroid by dot-argmax (first-max-wins), order cluster members by
    affinity ascending (tie: vec_id), remove any member with an earlier
    same-cluster neighbor at cosine >= tau — the upper-triangular rule of
    the released SemDeDup implementation."""
    from data_lake_medallion_architecture_project_spark.plans.curation import (
        _SEMDEDUP_TAU,
    )
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cent = np.array(_CLUSTER_CENTROIDS_K8, dtype=np.float64)
    dots = x @ cent.T
    assign = dots.argmax(axis=1)  # numpy argmax is first-max-wins
    nrm = np.sqrt((x * x).sum(axis=1))
    aff = dots[np.arange(len(x)), assign] / nrm
    expected_removed = set()
    for c in np.unique(assign):
        mask = assign == c
        order = np.lexsort((ids[mask], aff[mask]))
        member_idx = np.flatnonzero(mask)[order]
        for pos, i in enumerate(member_idx):
            for j in member_idx[:pos]:
                cos = x[i] @ x[j] / (nrm[i] * nrm[j])
                if cos >= _SEMDEDUP_TAU:
                    expected_removed.add(int(ids[i]))
                    break
    out = REGISTRY["semdedup_keep_list"].build(spark, sf).collect()
    assert len(out) == len(ids)
    got_removed = {int(r["vec_id"]) for r in out if not r["is_kept"]}
    assert got_removed == expected_removed
    got_assign = {int(r["vec_id"]): r["centroid"] for r in out}
    for i, vid in enumerate(ids):
        assert got_assign[int(vid)] == int(assign[i])


def test_semdedup_prune_blas_matches_exact_query(spark):
    """The BLAS scale path (operators/similarity.py:semdedup_prune) must
    produce the identical keep-set, assignment, and (to float tolerance)
    affinities as the exact relational gate query on the gate corpora."""
    from data_lake_medallion_architecture_project_spark.operators.similarity import semdedup_prune
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )
    from data_lake_medallion_architecture_project_spark.plans.curation import _SEMDEDUP_TAU
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            r["vec_id"]: r
            for r in REGISTRY["semdedup_keep_list"].build(spark, sf).collect()
        }
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        blas = {
            r["vec_id"]: r
            for r in semdedup_prune(
                emb, _CLUSTER_CENTROIDS_K8, tau=_SEMDEDUP_TAU
            ).collect()
        }
        assert set(exact) == set(blas)
        for vid, e in exact.items():
            b = blas[vid]
            assert b["centroid"] == e["centroid"]
            assert b["is_kept"] == e["is_kept"]
            assert abs(b["affinity"] - e["affinity"]) < 1e-9


def test_semdedup_append_matches_numpy_rule(spark):
    """Append-mode SemDeDup replayed in numpy: corpus (vec_id < split) keeps
    by the triangular rule; a batch vector is dup_of_corpus if within tau of
    a KEPT corpus member of its cluster, else dup_in_batch if within tau of
    an earlier-ranked batch member (kept or not — the triangular
    relaxation), else kept."""
    from data_lake_medallion_architecture_project_spark.plans.curation import (
        _BATCH_SPLIT_ID,
        _SEMDEDUP_TAU,
    )
    from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
        _CLUSTER_CENTROIDS_K8,
    )
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cent = np.array(_CLUSTER_CENTROIDS_K8, dtype=np.float64)
    dots = x @ cent.T
    assign = dots.argmax(axis=1)
    nrm = np.sqrt((x * x).sum(axis=1))
    aff = dots[np.arange(len(x)), assign] / nrm
    xn = x / nrm[:, None]

    def cluster_order(mask, c):
        m = mask & (assign == c)
        order = np.lexsort((ids[m], aff[m]))
        return np.flatnonzero(m)[order]

    corpus_mask = ids < _BATCH_SPLIT_ID
    corpus_kept = set()
    for c in np.unique(assign[corpus_mask]):
        members = cluster_order(corpus_mask, c)
        for pos, i in enumerate(members):
            if not any(xn[i] @ xn[j] >= _SEMDEDUP_TAU for j in members[:pos]):
                corpus_kept.add(i)

    batch_mask = ids >= _BATCH_SPLIT_ID
    expected = {}
    for c in np.unique(assign[batch_mask]):
        members = cluster_order(batch_mask, c)
        kept_corpus_c = [j for j in corpus_kept if assign[j] == c]
        for pos, i in enumerate(members):
            if any(xn[i] @ xn[j] >= _SEMDEDUP_TAU for j in kept_corpus_c):
                expected[int(ids[i])] = "dup_of_corpus"
            elif any(xn[i] @ xn[j] >= _SEMDEDUP_TAU for j in members[:pos]):
                expected[int(ids[i])] = "dup_in_batch"
            else:
                expected[int(ids[i])] = "kept"

    out = REGISTRY["semdedup_append_batch"].build(spark, sf).collect()
    assert len(out) == int(batch_mask.sum())
    got = {int(r["vec_id"]): r["status"] for r in out}
    assert got == expected


def test_semdedup_prune_bucketed_matches_in_memory(spark, tmp_path):
    """Pruning a write_ivf_bucketed index (assignment paid at write time)
    must reproduce semdedup_prune's output exactly with the index's own
    centroids."""
    from data_lake_medallion_architecture_project_spark.operators.similarity import (
        semdedup_prune,
        semdedup_prune_bucketed,
        write_ivf_bucketed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    cent = write_ivf_bucketed(emb, idx, n_centroids=8, seed=42)
    mem = {
        r["vec_id"]: r for r in semdedup_prune(emb, cent, tau=0.4).collect()
    }
    buck = {
        r["vec_id"]: r
        for r in semdedup_prune_bucketed(spark, idx, tau=0.4).collect()
    }
    assert set(mem) == set(buck)
    for vid, m in mem.items():
        b = buck[vid]
        assert (m["centroid"], m["is_kept"]) == (b["centroid"], b["is_kept"])
        assert abs(m["affinity"] - b["affinity"]) < 1e-12


def test_excise_shared_ngrams_planted_boilerplate(spark):
    """Excision semantics on a controlled corpus: the canonical (min doc,
    pos) occurrence of a shared 5-gram survives, every other occurrence is
    cut, within-doc repeats count, short docs pass through, and a full
    duplicate cleans to the empty string."""
    from data_lake_medallion_architecture_project_spark.operators.dedup import excise_shared_ngrams

    boiler = "all rights reserved by example corp"  # 6 tokens -> two 5-grams
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta epsilon"),
            (2, f"zeta eta theta iota kappa {boiler}"),
            (3, "tiny doc"),
            (4, "u v w x y u v w x y"),  # within-doc repeat of a 5-gram
            (5, f"{boiler} alpha beta gamma delta epsilon"),  # full dup of 1
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in excise_shared_ngrams(docs, "doc_id", "text", n=5).collect()
    }
    # Doc 1 holds the canonical occurrences (min doc_id) -> unchanged.
    assert out[1]["cleaned_text"] == f"{boiler} alpha beta gamma delta epsilon"
    assert out[1]["n_removed"] == 0
    # Doc 2 loses exactly the boilerplate span (6 tokens: two overlapping
    # 5-gram occurrences cover positions 6..11).
    assert out[2]["cleaned_text"] == "zeta eta theta iota kappa"
    assert out[2]["n_removed"] == 6
    # Short doc passes through untouched.
    assert out[3]["cleaned_text"] == "tiny doc" and out[3]["n_removed"] == 0
    # Within-doc repeat: the second "u v w x y" occurrence is excised.
    assert out[4]["cleaned_text"] == "u v w x y"
    assert out[4]["n_removed"] == 5
    # A full duplicate of doc 1 is pure boilerplate -> empty string.
    assert out[5]["cleaned_text"] == "" and out[5]["n_removed"] == out[5]["n_tokens"]


def test_excise_cover_is_positionwise_not_gramwise(spark):
    """A doc sharing only its PREFIX with an earlier doc keeps its novel
    suffix: cover is by token position, so overlapping dup grams never
    bleed into unique content."""
    from data_lake_medallion_architecture_project_spark.operators.dedup import excise_shared_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e novel tail content here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in excise_shared_ngrams(docs, "doc_id", "text", n=5).collect()
    }
    assert out[1]["n_removed"] == 0
    # Doc 2's only dup 5-gram is "a b c d e" (positions 1..5); the rest stays.
    assert out[2]["cleaned_text"] == "novel tail content here"
    assert out[2]["n_removed"] == 5


def test_normalized_dedup_collapses_reformatted_variants(spark):
    """Normalization semantics: casing / punctuation / whitespace variants
    collapse to one canonical doc; genuinely different text does not."""
    from data_lake_medallion_architecture_project_spark.functions.text import normalize_text
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "  HELLO   world?? "),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    n = docs.select("doc_id", normalize_text("text").alias("norm"))
    groups = {
        r["doc_id"]: r["n"]
        for r in n.groupBy("norm")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert groups == {1: 3, 4: 1}


def test_semantic_split_contamination_cross_check(spark):
    """The contamination list must equal what the independent brute-force
    pair query + the canonical md5 split rule imply: for every reported
    eval vector, its train-neighbor count matches; no train vector is ever
    reported; vectors with only same-split neighbors are absent."""
    import collections
    import hashlib

    from data_lake_medallion_architecture_project_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"

    def split_of(vid: int) -> str:
        b = hashlib.md5(str(vid).encode()).hexdigest()[:2]
        return "train" if b < "cc" else ("val" if b < "e6" else "test")

    pairs = REGISTRY["embedding_near_dup_pairs"].build(spark, sf).collect()
    want = collections.Counter()
    for r in pairs:
        sa, sb = split_of(r["id_a"]), split_of(r["id_b"])
        if sa == "train" and sb != "train":
            want[(r["id_b"], sb)] += 1
        elif sb == "train" and sa != "train":
            want[(r["id_a"], sa)] += 1

    got = {
        (r["vec_id"], r["split"]): r["n_train_neighbors"]
        for r in REGISTRY["semantic_split_contamination"].build(spark, sf).collect()
    }
    assert got == dict(want) and got  # non-vacuous on the gate corpus
    assert all(split_of(v) != "train" for v, _ in got)


def test_excise_null_text_matches_oracle(spark):
    """ADVICE r12 (medium): the r12 cut-position rewrite dropped the
    coalesce on cleaned_text, so NULL-text documents rebuilt to NULL while
    the unchanged DuckDB oracle emits ''. Run the REAL registry oracle SQL
    side-by-side on a corpus containing a NULL-text row and require all
    four columns to agree per doc (NULL n_tokens/n_removed on both sides,
    '' cleaned_text)."""
    import duckdb

    from data_lake_medallion_architecture_project_spark.operators.dedup import excise_shared_ngrams
    from data_lake_medallion_architecture_project_spark.plans.curation import _EXCISE_ORACLE, _XGRAM_N

    rows = [
        (1, "a b c d e f a b c d e f"),
        (2, None),
        (3, "a b c d e f x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in excise_shared_ngrams(docs, "doc_id", "text", n=_XGRAM_N).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'a b c d e f a b c d e f'), (2, NULL), "
        "(3, 'a b c d e f x y z')) t(doc_id, text)"
    )
    want = {
        doc_id: (n_tokens, n_removed, cleaned)
        for doc_id, n_tokens, n_removed, cleaned in con.execute(
            _EXCISE_ORACLE
        ).fetchall()
    }
    assert got == want
    assert got[2] == (None, None, "")  # the regression shape, pinned
