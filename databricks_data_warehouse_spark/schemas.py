"""Explicit silver schemas (schema-on-write, NOT NULL) — parity with the
reference's hand-declared StructTypes (Silver-Validation-Customers.py:24-32,
-Addresses.py:37-45, -Orders.py:24-34, -Items.py:24-30,
-OrderDetails.py:24-29). Bronze stays schema-on-read (parquet-inferred);
DLQ/gold schemas derive from the computed DataFrames (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _nn(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=False)


SILVER_CUSTOMERS = StructType(
    [
        _nn("id", LongType()),
        _nn("type", StringType()),
        _nn("status", StringType()),
        _nn("created_on", TimestampType()),
        _nn("year", IntegerType()),
        _nn("month", IntegerType()),
    ]
)

SILVER_ADDRESSES = StructType(
    [
        _nn("id", LongType()),
        _nn("created_on", TimestampType()),
        _nn("city", StringType()),
        _nn("state", StringType()),
        _nn("country", StringType()),
        _nn("addressline", StringType()),
    ]
)

SILVER_ORDERS = StructType(
    [
        _nn("id", LongType()),
        _nn("customer_id", LongType()),
        _nn("address_id", LongType()),
        _nn("created_on", TimestampType()),
        _nn("delivery_date", DateType()),
        _nn("delivered_on", DateType()),
        _nn("year", IntegerType()),
        _nn("month", IntegerType()),
    ]
)

SILVER_ITEMS = StructType(
    [
        _nn("id", IntegerType()),
        _nn("codes", StringType()),
        _nn("descriptions", StringType()),
        _nn("price", FloatType()),
    ]
)

SILVER_ORDER_DETAILS = StructType(
    [
        _nn("order_id", LongType()),
        _nn("item_id", IntegerType()),
        _nn("quantity", LongType()),
    ]
)

SILVER_SCHEMAS = {
    "customers": SILVER_CUSTOMERS,
    "addresses": SILVER_ADDRESSES,
    "orders": SILVER_ORDERS,
    "items": SILVER_ITEMS,
    "order_details": SILVER_ORDER_DETAILS,
}
