"""Popularity aggregations (SURVEY §2.4 A4/A5).

- distinct_reach: count(DISTINCT customer) per product — the tp2
  "similarity without customer_id" fallback (tp2/app/main.py:134-141).
- order_frequency: orders-per-product — tp2's "pagerank" stub
  (tp2/app/main.py:181-187).

Both are single hash aggregations; at scale `approx_count_distinct` is the
drop-in when exactness isn't gated (kept exact here because the DuckDB
oracle compares values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def distinct_reach(incidence: DataFrame,
                   product_col: str = "product_id",
                   customer_col: str = "customer_id") -> DataFrame:
    """(product_id, reach) — reach = exact distinct customers."""
    return (
        incidence.groupBy(F.col(product_col).alias("product_id"))
        .agg(F.countDistinct(customer_col).alias("reach"))
    )


def order_frequency(items: DataFrame,
                    order_col: str = "order_id",
                    product_col: str = "product_id") -> DataFrame:
    """(product_id, order_count) — distinct orders containing the product."""
    return (
        items.select(F.col(order_col).alias("__o"), F.col(product_col).alias("product_id"))
        .distinct()
        .groupBy("product_id")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
