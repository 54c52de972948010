"""Registry infrastructure shared by the per-domain query modules:
the QUERIES/ORACLES dicts, the register decorator, and the helper frames
/ SQL fragments used by more than one domain."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# A/B-harness-only entries: measured by scripts/scaling_report.py and
# value-gated by tests/test_oracle_parity.py, but NOT exported through
# __spark_entry__.queries() — deliberately-bad pedagogical baselines live
# here so the driver registry never carries a scale-killer plan
# (r10 verdict next-round #7, option (a)).
AB_QUERIES: dict[str, QueryFn] = {}
AB_ORACLES: dict[str, str] = {}


def _register_into(queries: dict[str, QueryFn], oracles: dict[str, str],
                   name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # pin UTC (and AQE) however the caller configured its session —
            # timestamp-typed outputs must not shift with the harness TZ
            from ..session import tune_session
            return fn(tune_session(spark), sf_dir)
        queries[name] = wrapped
        if oracle is not None:
            oracles[name] = oracle
        return fn
    return deco


def register(name: str, oracle: str | None = None):
    return _register_into(QUERIES, ORACLES, name, oracle)


def register_ab(name: str, oracle: str | None = None):
    return _register_into(AB_QUERIES, AB_ORACLES, name, oracle)


def _items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem in the reference's order_items role (FIXTURES.md §4):
    l_orderkey→order_id, l_partkey→product_id."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
    )


def _order_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer_id, product_id) pairs from orders ⋈ lineitem.

    The FK join is broadcast-friendly only for tiny dims; orders is not
    tiny, so this is a shuffled equi-join on the order key — co-partitioned
    with the co-occurrence self-join when both run in one plan.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
    )
    return _items(spark, sf_dir).join(orders, "order_id").select(
        "customer_id", "product_id")


# --- SQL fragment shared by co-occurrence oracles: enforce the reference's
# PK(order_id, product_id) invariant (01_schema.sql:25-30) on lineitem.
_SQL_ITEMS = "SELECT DISTINCT l_orderkey AS order_id, l_partkey AS product_id FROM lineitem"


_SQL_INC = """
SELECT DISTINCT o.o_custkey AS customer_id, l.l_partkey AS product_id
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""
