"""Tests for sources/shards.py — deterministic JSONL shard export."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.sources.shards import (
    read_jsonl_shards,
    with_shard,
    write_jsonl_shards,
)

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def test_shard_assignment_deterministic_and_uniform(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["shard"] for r in with_shard(docs, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in with_shard(docs, "doc_id", 8).collect()}
    assert a == b
    assert all(0 <= s < 8 for s in a.values())
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 500 docs over 8 shards: every shard populated, none > 2x the mean.
    assert len(counts) == 8
    assert max(counts.values()) < 2 * (len(a) / 8)


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, key="doc_id", n_shards=4)
    back = read_jsonl_shards(spark, out)
    assert back.count() == docs.count()
    orig = {r["doc_id"]: (r["text"], r["source"]) for r in docs.collect()}
    got = {r["doc_id"]: (r["text"], r["source"]) for r in back.collect()}
    assert got == orig
    # Physical layout: shard=i directories, real newline-delimited JSON.
    files = glob.glob(f"{out}/shard=*/part-*.json")
    assert files
    with open(files[0]) as fh:
        line = fh.readline()
    assert set(json.loads(line)) == {"doc_id", "text", "source"}


def test_shard_prune_reads_subset(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, key="doc_id", n_shards=4)
    some = read_jsonl_shards(spark, out, shards=[0, 2])
    full = with_shard(docs, "doc_id", 4)
    expect = full.filter(F.col("shard").isin([0, 2])).count()
    assert some.count() == expect
    # The shard filter must reach the scan as a partition filter, not a
    # post-scan predicate over all shards.
    plan = some._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan


def test_in_shard_order_is_hash_order_not_ingest_order(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, key="doc_id", n_shards=2)
    files = sorted(glob.glob(f"{out}/shard=0/part-*.json"))
    ids = []
    for f in files:
        with open(f) as fh:
            ids += [json.loads(line)["doc_id"] for line in fh]
    assert ids != sorted(ids)  # not ingest/id order: the shuffle happened
    import hashlib

    by_hash = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert ids == by_hash  # ...and it is exactly the deterministic hash order
