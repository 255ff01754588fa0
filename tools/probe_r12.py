"""Round-12 scale probes — reproduces the SCALE.md round-12 numbers.

Measures, warm (3 passes, first discarded in the writeup):
  * `bpe_encoded_token_counts` (flat chain, certification tier) vs
    `bpe_token_counts_vocab` (occurrence-deduped scale tier) vs the
    pandas-UDF canonical encoder, at 1x / 10x / 100x replicated corpora,
    asserting the three agree on total piece mass at every decade;
  * `temperature_mix_sample` at 1x / 10x;
  * the scrub door's map cost (`scrubbed_batch`) at 1x / 10x.

Build the scaled dirs first:
    python tools/make_scale10.py /root/testdata/sf0.1 /tmp/sfscale10_r12 10
    python tools/make_scale10.py /root/testdata/sf0.1 /tmp/sfscale100_r12 100
Usage:
    python tools/probe_r12.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.bpe import encode_with_merges
from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import _BPE_MERGES
from data_lake_medallion_architecture_project_spark.plans.sampling import temperature_mix_sample
from data_lake_medallion_architecture_project_spark.plans.tokenization import (
    bpe_encoded_token_counts,
    bpe_token_counts_vocab,
)
from data_lake_medallion_architecture_project_spark.sources.readers import load_table
from data_lake_medallion_architecture_project_spark.streaming.scrub_ingest import scrubbed_batch

DECADES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sfscale10_r12"),
    ("100x", "/tmp/sfscale100_r12"),
]


def timeit(fn, n=3):
    out = []
    for _ in range(n):
        t = time.time()
        r = fn()
        out.append(round(time.time() - t, 2))
    return out, r


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    for tag, d in DECADES:
        if not os.path.isdir(d):
            print(f"{tag}: {d} missing, skipping (see module docstring)")
            continue
        flat_t, flat = timeit(
            lambda: bpe_encoded_token_counts(spark, d)
            .agg(F.sum("n_bpe_tokens"))
            .collect()[0][0]
        )
        vocab_t, vocab = timeit(
            lambda: bpe_token_counts_vocab(spark, d)
            .agg(F.sum("n_bpe_tokens"))
            .collect()[0][0]
        )
        docs = load_table(spark, d, "documents")
        assert flat == vocab, (flat, vocab)
        if tag != "100x":
            # The UDF path materializes a pieces ARRAY per token row; at
            # 100x (785M token rows) its join build OOMed the default-heap
            # driver — the config-sensitivity the count-only JVM tiers
            # don't have. Timed on the decades where it runs comfortably.
            udf_t, udf = timeit(
                lambda: encode_with_merges(docs, _BPE_MERGES)
                .agg(F.sum(F.size("pieces")))
                .collect()[0][0]
            )
            assert flat == udf, (flat, udf)
            print(f"{tag} bpe: flat {flat_t} | vocab {vocab_t} | udf {udf_t}"
                  f"  (mass {flat}, three-way agreement)")
        else:
            print(f"{tag} bpe: flat {flat_t} | vocab {vocab_t}"
                  f"  (mass {flat}, two-tier agreement)")
        if tag != "100x":
            tm_t, tm = timeit(
                lambda: temperature_mix_sample(spark, d).count()
            )
            print(f"{tag} temperature_mix_sample: {tm_t} ({tm} kept)")
            sc_t, _ = timeit(
                lambda: scrubbed_batch(docs)
                .agg(F.sum(F.length("text")))
                .collect()[0][0]
            )
            print(f"{tag} scrubbed_batch: {sc_t}")
    spark.stop()


if __name__ == "__main__":
    main()
