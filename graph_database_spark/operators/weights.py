"""Event-interaction weighting (SURVEY §2.2 P6 + §2.4 A2).

Reference semantics: tp1/knoledge_graphs/graph.py:12-16 defines
EVENT_WEIGHTS = {view: 0.5, click: 1.0, add_to_cart: 2.0}; graph.py:64-68
accumulates the summed weight per (customer, product); *unknown event types
weigh 0* (graph.py:67 `.get(event_type, 0)`), while the ETL's edge-type map
defaults unknowns to VIEWED (tp2/app/etl.py:314) — two different defaults,
both preserved here.

Spark mapping: a literal map lookup compiled into the plan (create_map +
element_at stays inside whole-stage codegen — no UDF, no join), then a
hash aggregation with map-side partial sums.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

# tp1/knoledge_graphs/graph.py:12-16
EVENT_WEIGHTS_REFERENCE: dict[str, float] = {
    "view": 0.5,
    "click": 1.0,
    "add_to_cart": 2.0,
}

# FIXTURES.md §4 analog for the driver's events table
# ({view, click, purchase, error, signup}): purchase plays add_to_cart's
# role; unknown types (error, signup) weigh 0 per graph.py:67.
EVENT_WEIGHTS_DRIVER: dict[str, float] = {
    "view": 0.5,
    "click": 1.0,
    "purchase": 2.0,
}


def event_weight_col(event_type: Column,
                     weights: dict[str, float] | None = None,
                     default: float = 0.0) -> Column:
    """Map event_type → weight as a codegen'd literal-map lookup."""
    weights = EVENT_WEIGHTS_REFERENCE if weights is None else weights
    mapping = F.create_map(*[F.lit(x) for x in chain.from_iterable(weights.items())])
    return F.coalesce(F.element_at(mapping, event_type), F.lit(default))


def event_weights(events: DataFrame,
                  group_cols: tuple[str, ...] = ("customer_id", "product_id"),
                  event_type_col: str = "event_type",
                  weights: dict[str, float] | None = None) -> DataFrame:
    """Σ weight per group (tp1 graph.py:64-68, A2).

    Output: group_cols + (weight double). Weights are multiples of 0.5, so
    the double sum is exact and order-independent — safe for distributed
    aggregation and oracle hash comparison.
    """
    w = event_weight_col(F.col(event_type_col), weights)
    return (
        events.groupBy(*group_cols)
        .agg(F.sum(w).alias("weight"))
    )
