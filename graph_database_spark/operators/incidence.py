"""Bipartite customer–product incidence (SURVEY §2.7 SE1, §2.4 A3).

Reference: tp1/knoledge_graphs/graph.py:55-66 builds product_customers /
customer_products sets from *both* orders and events. In Spark the sets are
a distinct-pairs DataFrame (never a map-typed column — SURVEY §1.2): set
semantics come from `.distinct()`, and downstream set ops (Jaccard, seeds,
exclusion) are joins, which distribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def incidence_pairs(order_pairs: DataFrame,
                    event_pairs: DataFrame | None = None) -> DataFrame:
    """Distinct (customer_id, product_id) from orders ∪ events (SE1).

    `order_pairs` / `event_pairs` are any DataFrames exposing customer_id
    and product_id columns; pass event_pairs=None when the deployment has
    no interaction stream.
    """
    pairs = order_pairs.select("customer_id", "product_id")
    if event_pairs is not None:
        pairs = pairs.unionByName(event_pairs.select("customer_id", "product_id"))
    return pairs.distinct()


def order_incidence(orders: DataFrame, items: DataFrame,
                    order_id: str = "id") -> DataFrame:
    """(customer, product) pairs via the orders FK join (graph.py:55-59)."""
    return (
        items.join(orders.select(F.col(order_id).alias("__oid"), "customer_id"),
                   items["order_id"] == F.col("__oid"))
        .select("customer_id", "product_id")
    )
