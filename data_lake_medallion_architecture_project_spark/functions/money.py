"""Cross-engine-deterministic money aggregation.

Summing doubles is order-dependent; Spark's partial aggregation order differs
from any other engine's, so ``SUM(double)`` can differ in the last ulp between
Spark and the DuckDB oracle — enough to break a value-hash comparison. The
reference sidesteps this by being single-threaded pandas; a distributed engine
cannot.

Discipline used by every money aggregate in this repo:

1. Cast each input to ``DECIMAL(18, s)`` *before* aggregating. Inputs are
   written with ≤2 (sometimes ≤6 after arithmetic) decimal digits, so the cast
   is exact and the decimal SUM is exact and order-independent.
2. Cast the exact decimal result back to ``DOUBLE`` for the output column —
   the same decimal value maps to the same double in every engine.
3. For averages, divide the exact-double sum by the row count: two identical
   IEEE-754 doubles divide to identical results everywhere. Never round a
   computed double — ``round`` half-way behavior on binary doubles is the one
   thing engines genuinely disagree on.

Each Spark helper has an ``oracle_*`` twin that renders the equivalent ANSI SQL
for DuckDB, guaranteeing the two sides of the driver's comparison do the same
exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


_SPLIT_BITS = 21
_SPLIT = 1 << _SPLIT_BITS
_SPLIT_MASK = _SPLIT - 1


def scaled_long_sum(c: Column, scale: int) -> Column:
    """SUM as scaled-long integer arithmetic — exact and order-independent,
    like the decimal cast, but a primitive codegen sum (~40% faster measured).

    Equal to ``SUM(CAST(c AS DECIMAL(p,scale)))`` under this module's input
    precondition (values carry ≤``scale`` decimal digits): for such doubles
    the ×10^scale product lands within ~1 ulp of an integer, far from any
    .5 rounding boundary, so HALF_UP round recovers the exact fixed-point
    value the decimal cast would. The oracle SQL keeps the decimal form —
    the sf0.01 value-hash sweep is the cross-check that both sides agree.

    Overflow safety WITHOUT the decimal-accumulator tax: a plain long
    accumulator wraps silently once the scaled sum exceeds ~9.2e18 (reachable
    at 100 TB: ~1e10 rows of a scale-6 column averaging 1e3 is 1e19), and a
    DECIMAL(38,0) accumulator fixes that but measures ~60% slower (decimal
    sum leaves the primitive codegen path). Instead the scaled long is split
    into two primitive LONG sums — hi = scaled >> 21 (arithmetic shift =
    floor division) and lo = scaled & (2²¹−1) — recombined in DECIMAL(38,0)
    only on the handful of RESULT rows: total = 2²¹·Σhi + Σlo. The per-row
    identity scaled = 2²¹·(scaled>>21) + (scaled & mask) is exact in two's
    complement (lo is always non-negative), so the split sums are exactly the
    unsplit sum, order-independent, at long-sum speed (measured parity).

    Envelope: Σlo < n·2²¹ overflows long only past n = 2⁴² ≈ 4.4e12 rows per
    group (100 TB lineitem is ~6e11 rows TOTAL); Σhi needs n·(max scaled
    value)/2²¹ < 2⁶³ — for per-row scaled ≤ 1e13 (a 10-million-unit charge at
    scale 6) that is n < 2.4e15 rows per group. For a petabyte-class corpus
    beyond these bounds, extend to a 3-way split (shift 42/21/0) — same
    construction, n < 2⁶³ rows.
    """
    factor = 10**scale
    scaled = F.round(c * factor).cast("long")
    hi = F.sum(F.shiftright(scaled, _SPLIT_BITS)).cast("decimal(38,0)")
    lo = F.sum(scaled.bitwiseAND(F.lit(_SPLIT_MASK))).cast("decimal(38,0)")
    return (hi * _SPLIT + lo) / float(factor)


def dec_sum(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Exact, order-independent SUM of a fixed-point double column."""
    c = F.col(col) if isinstance(col, str) else col
    return scaled_long_sum(c, scale).alias(alias)


def dec_avg(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """AVG as exact-double-sum / non-null count (matches SQL AVG null handling)."""
    c = F.col(col) if isinstance(col, str) else col
    return (scaled_long_sum(c, scale) / F.count(c)).alias(alias)


def decimal_sum(
    col: Column | str, alias: str, scale: int = 2, precision: int = 12
) -> Column:
    """DecimalType-native SUM — the SURVEY §1.4 ``DecimalType(12,2)`` upgrade
    path. Exact and order-independent like ``scaled_long_sum`` but the value
    STAYS decimal end-to-end (no double round-trip), which is what a money
    ledger wants; the cost is leaving the primitive codegen sum (~60% slower
    than the split-long trick — use this when the output type matters, the
    split-long form when only the value does)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).alias(alias)


def oracle_decimal_sum(
    expr: str, alias: str, scale: int = 2, precision: int = 12
) -> str:
    """DuckDB twin of ``decimal_sum`` rendered as VARCHAR: a fixed-scale
    decimal string ('123.45') is the one representation both engines print
    identically, so the value-hash compares the EXACT decimal, not a double
    projection of it."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS VARCHAR)"
        f" AS {alias}"
    )


def oracle_dec_sum(expr: str, alias: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) AS {alias}"


def oracle_dec_avg(expr: str, alias: str, scale: int = 2, precision: int = 18) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
