"""Reconciliation queries — keyed table diff as a registry-verified surface.

The gate corpus has only one copy of each table, so the registry query
manufactures the "replica that drifted" deterministically from ``orders``
itself: a modular rule perturbs some prices (updates), drops some keys
(deletes), and re-keys some rows into a disjoint range (inserts). Both
engines build the same drifted replica, diff it against the original, and
must agree on every classified key — which verifies the null-safe
comparison and presence logic, not just counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tablediff import diff_summary, table_diff
from ..sources.readers import load_table
from .registry import register

_DIFF_ORACLE = """
WITH replica AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0
              THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 103 = 0
),
l AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
j AS (
  SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
         CASE WHEN r.o_orderkey IS NULL THEN 'left_only'
              WHEN l.o_orderkey IS NULL THEN 'right_only'
              WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice
                OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
              THEN 'changed' END AS status
  FROM l FULL OUTER JOIN replica r ON l.o_orderkey = r.o_orderkey
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key
FROM j WHERE status IS NOT NULL
GROUP BY status
"""


@register("orders_reconciliation_diff", oracle=_DIFF_ORACLE, tags=("quality", "bench"))
def orders_reconciliation_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff ``orders`` against a deterministically-drifted replica of itself
    (price bumps on keys ≡0 mod 97 → changed; keys ≡0 mod 101 dropped →
    left_only; keys ≡0 mod 103 re-keyed into a disjoint range →
    right_only) and summarize per status. One key-partitioned full outer
    join; the diff — not the table — is what aggregates."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    bumped = F.when(
        F.col("o_orderkey") % 97 == 0,
        (F.col("o_totalprice").cast("decimal(18,2)") + 1).cast("double"),
    ).otherwise(F.col("o_totalprice"))
    replica = (
        orders.filter(F.col("o_orderkey") % 101 != 0)
        .withColumn("o_totalprice", bumped)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 103 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(1000000000)
            )
        )
    )
    diff = table_diff(orders, replica, keys=["o_orderkey"])
    return diff_summary(diff, keys=["o_orderkey"])


_EDITDIST_ORACLE = """
SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


@register("supplier_name_near_matches", oracle=_EDITDIST_ORACLE, tags=("dedup", "bench"))
def supplier_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on supplier names: all pairs within edit distance 1
    via FastSS deletion-neighborhood blocking (``operators/editdist.py``) —
    candidate generation is O(n·L) JVM expressions and one equi-join, never
    the n² pair scan the DuckDB oracle runs; the hash match proves the
    blocking's recall lemma held on real data."""
    from ..operators.editdist import edit_distance_pairs

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return edit_distance_pairs(sup, "s_suppkey", "s_name", max_dist=1).select(
        F.col("a_key").cast("long").alias("a_key"),
        F.col("b_key").cast("long").alias("b_key"),
        "dist",
    )
