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

from decimal import Decimal

from pyspark.sql import DataFrame, functions as F


def distinct_reach(incidence: DataFrame,
                   product_col: str = "product_id",
                   customer_col: str = "customer_id") -> DataFrame:
    """(product_id, reach) — reach = exact distinct customers."""
    return (
        incidence.groupBy(F.col(product_col).alias("product_id"))
        .agg(F.countDistinct(customer_col).alias("reach"))
    )


#: Exact dyadic half-life weights 1/2^k for k = 0..12 as decimal strings —
#: every value is a finite decimal (2^-12 needs 12 digits), so weighted
#: sums stay in exact DECIMAL arithmetic in any engine.
DECAY_WEIGHTS: list[str] = [
    str(Decimal(1) / (2 ** k)) for k in range(13)
]


def recency_decayed_popularity(orders: DataFrame, items: DataFrame,
                               half_life_days: int = 30) -> DataFrame:
    """(product_id, n_items, recency_score): quantity-weighted popularity
    with a step half-life decay — each elapsed `half_life_days` halves an
    order's contribution, floored at 1/2^12.

    Engine-exact by construction: the decay factor is element_at into a
    13-entry DECIMAL literal table (dyadic 1/2^k values are finite
    decimals), so score = Σ qty·w is pure DECIMAL arithmetic — no pow(),
    no float summation-order sensitivity, bit-identical in the oracle.
    The anchor date (corpus max) is a 1-row broadcast join; the fact-side
    work is one projection + one hash aggregate.
    """
    anchor = orders.agg(F.to_date(F.max("o_orderdate")).alias("__anchor"))
    # DECIMAL(13,12) weights × DECIMAL(12,2) qty → scale-14 product, well
    # inside every engine's 38-digit cap — exact, no rounding anywhere
    wtab = F.array(*[F.lit(w).cast("decimal(13,12)")
                     for w in DECAY_WEIGHTS])
    k = F.least(
        F.floor(F.datediff(F.col("__anchor"), F.to_date("o_orderdate"))
                / half_life_days),
        F.lit(len(DECAY_WEIGHTS) - 1)).cast("int")
    weighted = (
        items.join(orders.select(F.col("o_orderkey").alias("order_id"),
                                 "o_orderdate"), "order_id")
        .crossJoin(F.broadcast(anchor))
        .select("product_id",
                (F.col("quantity").cast("decimal(12,2)")
                 * F.element_at(wtab, k + 1)).alias("__w"))
    )
    return (weighted.groupBy("product_id")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("__w").cast("double"), 6)
                  .alias("recency_score")))


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
