"""Re-derive the pinned k-means centroid matrix for embedding_cluster_sizes.

Runs the seeded full-corpus fit (operators/kmeans.py:distributed_kmeans,
k=8, iters=4, seed=42) on the gate-scale embeddings table and prints the
matrix as Python source. Paste the output over _CLUSTER_CENTROIDS_K8 in
plans/_pinned_centroids.py whenever the fit algorithm or the gate dataset
changes; tests/test_kmeans.py asserts the pinned values still match a
fresh fit.

Also asserts the assignment is numerically robust for the oracle: the
Spark side argmaxes normalized·centroid dots (BLAS, float64) while the
DuckDB oracle argmaxes raw dots (mathematically identical argmax, but a
different summation order), so a near-tie between the best and second-best
centroid could round to different winners. The guard computes the minimum
relative top-2 margin across the whole gate corpus and refuses to pin a
model where it is within a few hundred ulps.

Usage: python tools/pin_centroids.py [sf_dir]   (default /root/testdata/sf0.01)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from data_lake_medallion_architecture_project_spark.operators.kmeans import distributed_kmeans
from data_lake_medallion_architecture_project_spark.sources.readers import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
emb = load_table(spark, sf_dir, "embeddings")
cent = distributed_kmeans(emb, k=8, iters=4)

# Margin guard (see module docstring): min over the corpus of
# (d_best - d_second) / max(|d_best|, eps) on the normalized-dot side.
import numpy as np  # noqa: E402

x = np.array(
    [r[0] for r in emb.select("embedding").collect()], dtype=np.float64
)
norms = np.linalg.norm(x, axis=1, keepdims=True)
x = x / np.where(norms == 0, 1.0, norms)
d = x @ np.array(cent, dtype=np.float64).T
top2 = np.sort(d, axis=1)[:, -2:]
margin = (top2[:, 1] - top2[:, 0]) / np.maximum(np.abs(top2[:, 1]), 1e-12)
MIN_REL_MARGIN = 1e-10  # ~450 ulps of float64 — far above summation-order noise
if float(margin.min()) < MIN_REL_MARGIN:
    raise SystemExit(
        f"refusing to pin: min relative top-2 margin {margin.min():.3e} < "
        f"{MIN_REL_MARGIN:.0e}; a near-tie could argmax differently between "
        "Spark (normalized BLAS dot) and DuckDB (raw list_dot_product)"
    )
print(f"# min relative top-2 assignment margin on this corpus: {margin.min():.3e}")
print("_CLUSTER_CENTROIDS_K8 = [")
for row in cent:
    print("    [" + ", ".join(repr(float(v)) for v in row) + "],")
print("]")
# Paste the printed constant over the one in plans/_pinned_centroids.py
# (keep that module's generated-file docstring).
