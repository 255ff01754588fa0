"""Edit-distance self-join — entity resolution without the quadratic scan.

"Which records are the same entity with a typo?" is the string-world
near-dup problem (the dedup ladder's MinHash/SimHash handle documents;
this handles NAMES — suppliers, customers, products). The naive plan is an
all-pairs levenshtein filter: O(n²) comparisons, a non-starter at catalog
scale. This operator uses FastSS/SymSpell deletion-neighborhood blocking:

* every string expands to its 1-deletion neighborhood {s} ∪ {s minus one
  char} — at most |s|+1 keys, generated JVM-side (no UDF);
* two strings within edit distance 1 ALWAYS share a neighborhood key
  (substitution at i → both yield s-minus-i; insertion/deletion → the
  shorter string is literally in the longer one's deletion set — the
  FastSS lemma, so candidate generation has guaranteed recall);
* candidates meet in one equi-join on the key — shuffle is O(n·L), linear
  in the data — and a final exact ``levenshtein`` filter kills the false
  positives (shared-key pairs can be up to distance 2).

Cost: candidate-bounded, like the prefix-filtered Jaccard join — the n²
pair space is never enumerated. The DuckDB oracle for the registry query
IS the naive quadratic scan, so the hash match proves the blocking lost no
pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_pairs"]


def _deletion_neighborhood(col: str):
    """{s} ∪ {s with one char deleted}, as a JVM expression (backtick-safe)."""
    q = col.replace("`", "``")
    return F.expr(
        f"array_union(array(`{q}`), transform(sequence(1, char_length(`{q}`)), "
        f"i -> concat(left(`{q}`, i - 1), substring(`{q}`, i + 1))))"
    )


def edit_distance_pairs(
    df: DataFrame, key_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """All pairs (a_key < b_key) with levenshtein(a, b) ≤ max_dist.

    Only ``max_dist=1`` is supported — the 1-deletion neighborhood's recall
    guarantee is specific to distance 1 (distance-k needs k-deletion
    neighborhoods, |s| choose k keys; compose or extend if ever needed)."""
    if max_dist != 1:
        raise ValueError("edit_distance_pairs supports max_dist=1 only")
    keyed = df.select(
        F.col(key_col).alias("k"),
        F.col(str_col).alias("s"),
        F.explode(_deletion_neighborhood(str_col)).alias("block"),
    )
    a = keyed.select(
        F.col("k").alias("a_key"), F.col("s").alias("a_s"), "block"
    )
    b = keyed.select(
        F.col("k").alias("b_key"), F.col("s").alias("b_s"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_s", "b_s")
        .distinct()  # a true pair can share several neighborhood keys
        .withColumn("dist", F.levenshtein("a_s", "b_s"))
        .filter(F.col("dist") <= max_dist)
        .select("a_key", "b_key", F.col("dist").cast("long").alias("dist"))
    )
