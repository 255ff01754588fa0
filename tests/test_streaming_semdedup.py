"""Streaming semantic-dedup ingest: exactly-once intake of an embedding
corpus under the SemDeDup rule, with batch-mode parity against the numpy
replay of the certified append semantics."""

from __future__ import annotations

import numpy as np

from data_lake_medallion_architecture_project_spark.plans._pinned_centroids import (
    _CLUSTER_CENTROIDS_K8,
)
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.semdedup_ingest import (
    run_semdedup_ingest,
    semdedup_batch_against_table,
)

SF = "/root/testdata/sf0.001"
SPLIT = 250
TAU = 0.4


def _numpy_sequential_keep(ids, x, cent, split, tau):
    """Replay of sequential SemDeDup ingest: triangular keep on the first
    batch, then the append rule (vs kept state + earlier batch members)."""
    dots = x @ cent.T
    assign = dots.argmax(axis=1)
    nrm = np.sqrt((x * x).sum(axis=1))
    aff = dots[np.arange(len(x)), assign] / nrm
    xn = x / nrm[:, None]
    kept: set[int] = set()
    for batch_mask in (ids < split, ids >= split):
        for c in np.unique(assign[batch_mask]):
            m = batch_mask & (assign == c)
            order = np.lexsort((ids[m], aff[m]))
            members = np.flatnonzero(m)[order]
            state = [j for j in kept if assign[j] == c]
            for pos, i in enumerate(members):
                if state and max(xn[i] @ xn[j] for j in state) >= tau:
                    continue
                if pos and max(xn[i] @ xn[j] for j in members[:pos]) >= tau:
                    continue
                kept.add(int(i))
    return {int(ids[i]) for i in kept}


def test_streaming_semdedup_matches_sequential_replay(spark, tmp_path):
    src = tmp_path / "incoming"
    tbl = str(tmp_path / "keepstate")
    ckpt = str(tmp_path / "ckpt")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cent = np.array(_CLUSTER_CENTROIDS_K8, dtype=np.float64)
    expected = _numpy_sequential_keep(ids, x, cent, SPLIT, TAU)

    # Two sequential ingests: corpus half, then batch half.
    emb.filter(f"vec_id < {SPLIT}").coalesce(1).write.mode("append").parquet(
        str(src)
    )
    assert (
        run_semdedup_ingest(
            spark, str(src), tbl, ckpt, _CLUSTER_CENTROIDS_K8, tau=TAU
        )
        == 1
    )
    emb.filter(f"vec_id >= {SPLIT}").coalesce(1).write.mode("append").parquet(
        str(src)
    )
    assert (
        run_semdedup_ingest(
            spark, str(src), tbl, ckpt, _CLUSTER_CENTROIDS_K8, tau=TAU
        )
        == 1
    )

    t = TxnTable(tbl)
    state = t.read(spark).collect()
    assert {r["vid"] for r in state} == expected
    # State invariant: stored vectors are the ORIGINAL embeddings (widened
    # to double), not renormalized copies.
    by_id = {int(i): v for i, v in zip(ids, x)}
    for r in state:
        assert np.array_equal(np.array(r["v"]), by_id[r["vid"]])

    # Nothing new: the file-source checkpoint yields no batch.
    assert (
        run_semdedup_ingest(
            spark, str(src), tbl, ckpt, _CLUSTER_CENTROIDS_K8, tau=TAU
        )
        == 0
    )

    # Crash-replay: re-applying a committed batch id is a no-op (txn marker).
    version_before = t.snapshot().version
    n_before = len(state)
    semdedup_batch_against_table(
        spark,
        t,
        emb.filter(f"vec_id >= {SPLIT}"),
        _CLUSTER_CENTROIDS_K8,
        app_id="semdedup_ingest/keepstate",
        batch_id=1,  # already committed by the second run
        tau=TAU,
    )
    assert t.snapshot().version == version_before
    assert len(t.read(spark).collect()) == n_before


def test_streaming_semdedup_agrees_with_append_query(spark, tmp_path):
    """The kept set of the second ingest equals the 'kept' statuses of the
    driver-gated semdedup_append_batch query on the same split."""
    from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY

    src = tmp_path / "incoming"
    tbl = str(tmp_path / "keepstate"); ckpt = str(tmp_path / "ckpt")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    for pred in (f"vec_id < {SPLIT}", f"vec_id >= {SPLIT}"):
        emb.filter(pred).coalesce(1).write.mode("append").parquet(str(src))
        run_semdedup_ingest(
            spark, str(src), tbl, ckpt, _CLUSTER_CENTROIDS_K8, tau=TAU
        )
    state_ids = {
        r["vid"] for r in TxnTable(tbl).read(spark).select("vid").collect()
    }
    batch_kept = {
        r["vec_id"]
        for r in REGISTRY["semdedup_append_batch"].build(spark, SF).collect()
        if r["status"] == "kept"
    }
    assert {i for i in state_ids if i >= SPLIT} == batch_kept
