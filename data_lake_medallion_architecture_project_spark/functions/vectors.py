"""Vector math over ``array<float>`` embedding columns — pure column
expressions (``transform``/``zip_with``/``aggregate``), no Python boundary.

Floats are widened to double before any arithmetic (exact), products of
identical doubles are IEEE-deterministic, and the fold order of ``aggregate``
is the array order — the same sequential order DuckDB's ``list_sum`` uses, so
dot products and norms agree bit-for-bit with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)
