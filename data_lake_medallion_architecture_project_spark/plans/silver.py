"""Bronze→Silver domain cleaners — reference-parity validation as lazy plans.

Re-expresses the three pandas processors of
``/root/reference/pipeline/bronze_to_silver.py`` (sales 35-85, customer_events
88-128, inventory 131-176) as pure DataFrame→DataFrame transforms:

1. timestamp parse with coerce-to-null (pandas ``errors="coerce"`` →
   ``try_cast``, which returns NULL on malformed input even under ANSI mode —
   a plain Spark 4 session has ANSI on, so a plain ``cast`` would throw);
2. dedup on the domain key (duplicates in the reference are exact row copies —
   bronze_to_silver.py:54-56 — so ``dropDuplicates`` is semantically equal to
   pandas keep-first);
3. ordered null checks over the required columns, then enum / range rules,
   accumulating the reference's exact ``"MSG; "`` error-string format;
4. sales only: auto-correct ``total_amount`` when it differs from
   quantity×unit_price by more than 0.01 (bround = pandas' half-even round);
5. stamp ``is_valid`` / ``validation_errors`` / ``processed_at`` (one literal
   timestamp per run — NOT per-row current_timestamp()).

Everything is a column expression inside whole-stage codegen; at 100 TB the
cleaners are a single scan with zero shuffles (dedup adds one shuffle keyed on
the domain id only when duplicates can span files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import (
    EVENTS_REQUIRED,
    INVENTORY_REQUIRED,
    SALES_REQUIRED,
    VALID_EVENT_TYPES,
    VALID_MOVEMENT_TYPES,
)


def _accumulate_errors(pieces: list[Column]) -> Column:
    """Reference error-string format: concatenate ``"MSG; "`` fragments in rule
    order, then strip (bronze_to_silver.py:59-77)."""
    return F.trim(F.concat(*pieces))


def _null_checks(required: tuple[str, ...]) -> list[Column]:
    return [
        F.when(F.col(c).isNull(), F.lit(f"NULL:{c}; ")).otherwise("") for c in required
    ]


def _finalize(df: DataFrame, errors: Column, processed_at: str) -> DataFrame:
    return (
        df.withColumn("validation_errors", errors)
        .withColumn("is_valid", F.col("validation_errors") == "")
        .withColumn("processed_at", F.lit(processed_at))
    )


def clean_sales(
    df: DataFrame, processed_at: str, money_type: str = "double"
) -> DataFrame:
    """Sales cleaner (bronze_to_silver.py:35-85): dedup on sale_id, NULL rules,
    total_amount auto-correction with half-even rounding and 0.01 epsilon.

    ``money_type="decimal"`` is the SURVEY §1.4 upgrade path: unit_price and
    total_amount flow as ``DecimalType(12,2)``, the expected total is the
    EXACT 2-dp product (integer quantity × 2-dp price needs no rounding, so
    pandas' half-even bround and the decimal product agree by construction)
    and the 0.01 epsilon comparison happens in exact decimal arithmetic —
    the reference's epsilon contract is preserved, just without float noise.
    Default stays ``"double"`` for byte-fidelity to the reference outputs."""
    df = df.withColumn("timestamp", F.col("timestamp").try_cast("timestamp"))
    df = df.dropDuplicates(["sale_id"])

    # Auto-correction before stamping: computable rows whose stored total
    # deviates from the recomputed total by >0.01 get the recomputed value.
    # Null-safe: if total_amount is NULL the comparison is NULL → no fix,
    # matching pandas NaN comparison semantics at line 69.
    if money_type == "decimal":
        df = df.withColumn(
            "unit_price", F.col("unit_price").cast("decimal(12,2)")
        ).withColumn("total_amount", F.col("total_amount").cast("decimal(12,2)"))
        # Scale-preserving quantity cast: decimal(12,2), NOT decimal(10,0) —
        # an integer-scale cast would silently half-up-round a fractional
        # quantity before the multiply, diverging from the double path's
        # bround(q×price, 2). With scale-2 quantity the product carries
        # scale 4 and only the final cast rounds (half-up; differs from the
        # double path's half-even only at exact .xx5 ties, which cannot
        # occur for the reference generator's integer quantities).
        expected = (
            F.col("quantity").cast("decimal(12,2)") * F.col("unit_price")
        ).cast("decimal(12,2)")
        epsilon = F.expr("CAST(0.01 AS DECIMAL(12,2))")
    else:
        expected = F.bround(F.col("quantity") * F.col("unit_price"), 2)
        epsilon = F.lit(0.01)
    computable = F.col("quantity").isNotNull() & F.col("unit_price").isNotNull()
    mismatch = F.abs(F.col("total_amount") - expected) > epsilon
    fixed = F.when(computable & mismatch, expected).otherwise(F.col("total_amount"))
    if money_type == "decimal":
        fixed = fixed.cast("decimal(12,2)")
    df = df.withColumn("total_amount", fixed)

    errors = _accumulate_errors(_null_checks(SALES_REQUIRED))
    return _finalize(df, errors, processed_at)


def clean_customer_events(df: DataFrame, processed_at: str) -> DataFrame:
    """Events cleaner (bronze_to_silver.py:88-128): dedup on event_id, NULL
    rules, then INVALID_EVENT_TYPE enum rule."""
    df = df.withColumn("timestamp", F.col("timestamp").try_cast("timestamp"))
    df = df.dropDuplicates(["event_id"])
    pieces = _null_checks(EVENTS_REQUIRED) + [
        F.when(
            ~F.col("event_type").isin(*VALID_EVENT_TYPES) & F.col("event_type").isNotNull(),
            F.lit("INVALID_EVENT_TYPE; "),
        ).otherwise("")
    ]
    return _finalize(df, _accumulate_errors(pieces), processed_at)


def clean_inventory(df: DataFrame, processed_at: str) -> DataFrame:
    """Inventory cleaner (bronze_to_silver.py:131-176): dedup on movement_id,
    NULL rules, INVALID_MOVEMENT_TYPE, NON_POSITIVE_QUANTITY."""
    df = df.withColumn("timestamp", F.col("timestamp").try_cast("timestamp"))
    df = df.dropDuplicates(["movement_id"])
    pieces = _null_checks(INVENTORY_REQUIRED) + [
        F.when(
            ~F.col("movement_type").isin(*VALID_MOVEMENT_TYPES)
            & F.col("movement_type").isNotNull(),
            F.lit("INVALID_MOVEMENT_TYPE; "),
        ).otherwise(""),
        F.when(
            F.col("quantity").isNotNull()
            & (F.col("quantity").try_cast("double") <= 0),
            F.lit("NON_POSITIVE_QUANTITY; "),
        ).otherwise(""),
    ]
    return _finalize(df, _accumulate_errors(pieces), processed_at)


CLEANERS = {
    "sales": clean_sales,
    "customer_events": clean_customer_events,
    "inventory": clean_inventory,
}
