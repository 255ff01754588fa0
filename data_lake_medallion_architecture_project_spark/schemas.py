"""Explicit schema registry.

The reference never declares schemas — pandas infers them from CSV
(``/root/reference/pipeline/bronze_to_silver.py:205-209``). A distributed engine
cannot afford per-file inference (extra scan + drift); every source here reads with
a declared ``StructType``.

Two groups:

* the three reference fact-table domains (``sales``, ``customer_events``,
  ``inventory``) — column lists per ``/root/reference/generator/*_generator.py``
  (sales 80-92, events 59-68, inventory 65-75);
* the driver testdata tables (TPC-H-ish star schema + events/documents/embeddings),
  read from parquet where the footer already carries types — listed here for
  reference and for CSV round-trip tests.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _field(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --------------------------------------------------------------------------- #
# Reference domains (Bronze CSV contracts).
# Timestamps arrive as ISO-8601 strings in CSV; Silver parses them with
# coerce-to-null semantics (F1 in SURVEY.md §2.4), so Bronze keeps StringType.
# quantity is nullable by contract (~3% corruption) → IntegerType nullable.
# --------------------------------------------------------------------------- #

SALES_BRONZE = StructType(
    [
        _field("sale_id", StringType()),
        _field("timestamp", StringType()),
        _field("customer_id", StringType()),
        _field("product_id", StringType()),
        _field("product_name", StringType()),
        _field("category", StringType()),
        _field("quantity", DoubleType()),  # CSV null round-trip → float, like pandas
        _field("unit_price", DoubleType()),
        _field("total_amount", DoubleType()),
        _field("payment_method", StringType()),
        _field("status", StringType()),
    ]
)

CUSTOMER_EVENTS_BRONZE = StructType(
    [
        _field("event_id", StringType()),
        _field("timestamp", StringType()),
        _field("customer_id", StringType()),
        _field("session_id", StringType()),
        _field("event_type", StringType()),
        _field("product_id", StringType()),
        _field("page_url", StringType()),
        _field("device_type", StringType()),
    ]
)

INVENTORY_BRONZE = StructType(
    [
        _field("movement_id", StringType()),
        _field("timestamp", StringType()),
        _field("product_id", StringType()),
        _field("product_name", StringType()),
        _field("warehouse_id", StringType()),
        _field("movement_type", StringType()),
        _field("quantity", DoubleType()),
        _field("unit_cost", DoubleType()),
        _field("supplier_id", StringType()),
    ]
)

BRONZE_SCHEMAS: dict[str, StructType] = {
    "sales": SALES_BRONZE,
    "customer_events": CUSTOMER_EVENTS_BRONZE,
    "inventory": INVENTORY_BRONZE,
}

# Enum value sets validated in Silver (/root/reference/pipeline/bronze_to_silver.py:27-28).
VALID_EVENT_TYPES = ("login", "browse", "add_to_cart", "checkout", "logout")
VALID_MOVEMENT_TYPES = ("inbound", "outbound", "adjustment")

# Required (non-null) columns per domain, in validation order — the order is
# load-bearing: validation_errors strings accumulate rule messages in this order
# (/root/reference/pipeline/bronze_to_silver.py:47-48,99,143-144).
SALES_REQUIRED = (
    "sale_id",
    "timestamp",
    "customer_id",
    "product_id",
    "quantity",
    "unit_price",
    "total_amount",
)
EVENTS_REQUIRED = ("event_id", "timestamp", "customer_id", "session_id", "event_type")
INVENTORY_REQUIRED = (
    "movement_id",
    "timestamp",
    "product_id",
    "warehouse_id",
    "movement_type",
    "quantity",
)

# --------------------------------------------------------------------------- #
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md).
# --------------------------------------------------------------------------- #

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType([_field("r_regionkey", IntegerType()), _field("r_name", StringType())]),
    "nation": StructType(
        [
            _field("n_nationkey", IntegerType()),
            _field("n_name", StringType()),
            _field("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            _field("c_custkey", LongType()),
            _field("c_name", StringType()),
            _field("c_nationkey", IntegerType()),
            _field("c_acctbal", DoubleType()),
            _field("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            _field("s_suppkey", LongType()),
            _field("s_name", StringType()),
            _field("s_nationkey", IntegerType()),
            _field("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            _field("p_partkey", LongType()),
            _field("p_name", StringType()),
            _field("p_brand", StringType()),
            _field("p_type", StringType()),
            _field("p_size", IntegerType()),
            _field("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            _field("o_orderkey", LongType()),
            _field("o_custkey", LongType()),
            _field("o_orderstatus", StringType()),
            _field("o_totalprice", DoubleType()),
            _field("o_orderdate", TimestampType()),
            _field("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            _field("l_orderkey", LongType()),
            _field("l_partkey", LongType()),
            _field("l_suppkey", LongType()),
            _field("l_linenumber", IntegerType()),
            _field("l_quantity", DoubleType()),
            _field("l_extendedprice", DoubleType()),
            _field("l_discount", DoubleType()),
            _field("l_tax", DoubleType()),
            _field("l_returnflag", StringType()),
            _field("l_linestatus", StringType()),
            _field("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            _field("event_id", LongType()),
            _field("ts", TimestampType()),
            _field("user_id", LongType()),
            _field("event_type", StringType()),
            _field("value", DoubleType()),
            _field("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            _field("doc_id", LongType()),
            _field("text", StringType()),
            _field("lang", StringType()),
            _field("source", StringType()),
            _field("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            _field("vec_id", LongType()),
            _field("embedding", ArrayType(FloatType())),
            _field("label", IntegerType()),
        ]
    ),
}

# Distinct event_type values of the driver `events` table, used by pivot plans.
EVENTS_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
