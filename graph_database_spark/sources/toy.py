"""The reference's 22-row seed dataset as typed Spark DataFrames.

Semantics source: tp2/postgres/init/02_seed.sql:1-27 (rows) and
tp2/postgres/init/01_schema.sql:1-39 (DDL); mirrored by the frozen
dataclasses at tp1/knoledge_graphs/data.py:9-194. Spark types per
SURVEY.md §1.2 (NUMERIC price observed as float at tp2/app/etl.py:247 →
DoubleType; TIMESTAMPTZ → TimestampType UTC).

This is the fixture dataset for golden-output tests (FIXTURES.md §3);
driver-scale inputs come from sources.testdata instead.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType, DoubleType, IntegerType, StringType, StructField, StructType,
    TimestampType,
)

_UTC = dt.timezone.utc


def _ts(s: str) -> dt.datetime:
    # reference format: %Y-%m-%dT%H:%M:%SZ (tp1/knoledge_graphs/data.py:91)
    return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=_UTC)


CUSTOMERS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("name", StringType(), False),
    StructField("join_date", DateType(), False),
])

CATEGORIES_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("name", StringType(), False),
])

PRODUCTS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("name", StringType(), False),
    StructField("price", DoubleType(), False),
    StructField("category_id", StringType(), True),
])

ORDERS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("customer_id", StringType(), False),
    StructField("ts", TimestampType(), False),
])

ORDER_ITEMS_SCHEMA = StructType([
    StructField("order_id", StringType(), False),
    StructField("product_id", StringType(), False),
    StructField("quantity", IntegerType(), False),
])

EVENTS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("customer_id", StringType(), False),
    StructField("product_id", StringType(), False),
    StructField("event_type", StringType(), False),
    StructField("ts", TimestampType(), False),
])


def toy_dataset(spark: SparkSession) -> dict[str, DataFrame]:
    """Build the six seed tables (tp2/postgres/init/02_seed.sql:1-27)."""
    customers = [
        ("C1", "Alice", dt.date(2024, 1, 2)),
        ("C2", "Bob", dt.date(2024, 2, 11)),
        ("C3", "Chloé", dt.date(2024, 3, 5)),
    ]
    categories = [("CAT1", "Electronics"), ("CAT2", "Books")]
    products = [
        ("P1", "Wireless Mouse", 29.99, "CAT1"),
        ("P2", "USB-C Hub", 49.00, "CAT1"),
        ("P3", "Graph Databases Book", 39.00, "CAT2"),
        ("P4", "Mechanical Keyboard", 89.00, "CAT1"),
    ]
    orders = [
        ("O1", "C1", _ts("2024-04-01T10:15:00Z")),
        ("O2", "C2", _ts("2024-04-02T12:30:00Z")),
        ("O3", "C1", _ts("2024-04-05T08:05:00Z")),
    ]
    order_items = [
        ("O1", "P1", 1), ("O1", "P2", 1), ("O2", "P3", 1),
        ("O3", "P4", 1), ("O3", "P2", 1),
    ]
    events = [
        ("E1", "C1", "P3", "view", _ts("2024-04-01T09:00:00Z")),
        ("E2", "C1", "P3", "click", _ts("2024-04-01T09:01:00Z")),
        ("E3", "C3", "P1", "view", _ts("2024-04-03T16:20:00Z")),
        ("E4", "C2", "P2", "view", _ts("2024-04-03T12:00:00Z")),
        ("E5", "C2", "P4", "add_to_cart", _ts("2024-04-03T12:10:00Z")),
    ]
    return {
        "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
        "categories": spark.createDataFrame(categories, CATEGORIES_SCHEMA),
        "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
        "orders": spark.createDataFrame(orders, ORDERS_SCHEMA),
        "order_items": spark.createDataFrame(order_items, ORDER_ITEMS_SCHEMA),
        "events": spark.createDataFrame(events, EVENTS_SCHEMA),
    }
