"""Re-derive the pinned BPE merge table for the
``bpe_encoded_token_counts`` registry query.

Trains the distributed BPE learner (operators/bpe.py:train_bpe —
deterministic: exact pair counts, freq-then-lexicographic tie-break) on
the gate-scale documents table and writes plans/_pinned_bpe.py: the
ordered merge list as Python literals. Pinning the merges lets BOTH
engines apply the identical merge chain: the registry query encodes each
document with a fixed sequence of separator-guarded string replaces (the
flat-string form of greedy rank-order merging), so Spark and DuckDB emit
the same exact piece counts — the pinned-logreg/PCA discipline applied to
the tokenizer tier.

Usage: python tools/pin_bpe.py [sf_dir] [n_merges]
       (defaults /root/testdata/sf0.01, 48)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from data_lake_medallion_architecture_project_spark.operators.bpe import train_bpe
from data_lake_medallion_architecture_project_spark.sources.readers import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 48
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
docs = load_table(spark, sf_dir, "documents")
merges = train_bpe(docs, n_merges=n_merges)

# Invariant the flat-string replace chain's equivalence proof rests on
# (plans/tokenization.py:_bpe_replace_chain, ADVICE r12): no two merges may
# concatenate to the SAME symbol string — e.g. ('a','bc') and ('ab','c')
# both yielding 'abc' would make the later rewrite's search pattern
# constructible by the earlier one, breaking "a later rewrite can never
# create an occurrence of an earlier pair". Assert at pin time so a bad
# table can never be written, instead of surfacing later as a parity test
# failure.
_results = [a + b for a, b in merges]
_dups = {r for r in _results if _results.count(r) > 1}
assert not _dups, (
    f"pinned merge table violates the distinct-result invariant: {_dups!r} "
    "produced by more than one merge — the replace-chain encoding is not "
    "equivalent to canonical BPE for this table; do not pin it"
)

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_lake_medallion_architecture_project_spark",
    "plans",
    "_pinned_bpe.py",
)
with open(out, "w") as f:
    f.write(
        '"""Pinned BPE merge table for ``bpe_encoded_token_counts``.\n\n'
        f"Trained by tools/pin_bpe.py on {sf_dir} documents with\n"
        f"n_merges={n_merges} (operators/bpe.py:train_bpe — deterministic).\n"
        "tests/test_bpe.py asserts a fresh fit still reproduces these\n"
        'merges. Regenerate with: python tools/pin_bpe.py\n"""\n\n'
    )
    f.write(f"_BPE_SF_DIR = {sf_dir!r}\n")
    f.write(f"_BPE_N_MERGES = {n_merges!r}\n")
    f.write("_BPE_MERGES = [\n")
    for a, b in merges:
        f.write(f"    ({a!r}, {b!r}),\n")
    f.write("]\n")
print(f"pinned {len(merges)} merges -> {out}")
for m in merges[:10]:
    print("  ", m)
