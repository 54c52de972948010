"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship query at sf0.001 (smoke: rows > 0).
queries()      -- one callable per implemented operator (SURVEY.md §2).
oracle_sql()   -- DuckDB-runnable ANSI SQL twin per query key.

Column names are aliased identically on both sides; double aggregates go
through DECIMAL sums (order-independent, exact) or are rounded, so the
driver's order-insensitive value-hash comparison is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_database_spark.session import tune_session
from graph_database_spark.registry import QUERIES, ORACLES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: global co-occurrence top-N over lineitem part pairs
    (SURVEY §7.4) at sf0.001."""
    tune_session(spark)
    return QUERIES["cooccurrence_topn"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
