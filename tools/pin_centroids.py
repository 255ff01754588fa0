"""Re-derive the pinned k-means centroid matrix for embedding_cluster_sizes.

Runs the seeded full-corpus fit (operators/kmeans.py:distributed_kmeans,
k=8, iters=4, seed=42) on the gate-scale embeddings table and prints the
matrix as Python source. Paste the output over _CLUSTER_CENTROIDS_K8 in
plans/curation.py whenever the fit algorithm or the gate dataset changes;
tests/test_kmeans.py asserts the pinned values still match a fresh fit.

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
print("_CLUSTER_CENTROIDS_K8 = [")
for row in cent:
    print("    [" + ", ".join(repr(float(v)) for v in row) + "],")
print("]")
# Paste the printed constant over the one in plans/_pinned_centroids.py
# (keep that module's generated-file docstring).
