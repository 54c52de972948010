from .cooccurrence import (
    symmetrize,
    cooccurrence_ordered,
    cooccurrence_unordered,
    cooccurrence_top_partners,
    row_normalized_adjacency,
)
from .weights import EVENT_WEIGHTS_REFERENCE, event_weight_col, event_weights
from .incidence import incidence_pairs
from .popularity import distinct_reach, order_frequency
from .topk import top_k

__all__ = [
    "cooccurrence_ordered",
    "cooccurrence_unordered",
    "cooccurrence_top_partners",
    "row_normalized_adjacency",
    "EVENT_WEIGHTS_REFERENCE",
    "event_weight_col",
    "event_weights",
    "incidence_pairs",
    "distinct_reach",
    "order_frequency",
    "top_k",
]
