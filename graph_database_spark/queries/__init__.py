"""Per-domain query registry package.

Importing this package registers every query: each domain module's
import runs its @register decorators (the ORDER of the domain imports
only affects names beyond the driver window — the window head is pinned
by _DRIVER_WINDOW_PRIORITY below)."""

from __future__ import annotations

from ._shared import ORACLES, QUERIES, QueryFn, register

from . import recommend as _recommend  # noqa: E402,F401
from . import relational as _relational  # noqa: E402,F401
from . import events as _events  # noqa: E402,F401
from . import graph as _graph  # noqa: E402,F401
from . import dedup_ann as _dedup_ann  # noqa: E402,F401
from . import text as _text  # noqa: E402,F401



# ---------------------------------------------------------------------------
# Driver-gate window ordering
# ---------------------------------------------------------------------------
# The external correctness harness checks only the FIRST 50 registered
# queries, so registration order is part of the contract. Definitions above
# are grouped by subject; this explicit priority list pins the 50-entry
# window to the entries carrying unique coverage — the events domain, the
# Q1/Q2 composite oracles (recommend_focal_blend / strategy_breakdown_focal),
# funnel/retention, and the full dedup/ANN battery — rotating redundant
# twins (e.g. motif_cooccurrence_topn duplicates cooccurrence_topn's answer)
# behind them. Every query stays registered and locally value-gated by
# tests/test_oracle_parity.py regardless of position.
# ROUND-5 ROTATION: rounds 1-4 gave 105 distinct entries external rows;
# this window keeps 10 canaries, puts the 14 entries that had never had
# a driver row first (closing external coverage to 119/119 — VERDICT r4
# item #1), and fills the rest with the stalest oracle-backed
# re-confirmations (last checked r1/r2/r3). pagerank_global and
# ppr_batch_focal stay out: they have no SQL oracle (iterative), so a
# window slot would burn a hash-checkable row on a rows-only check.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked (r4 late additions) — closes 119/119 coverage
    "embedding_topk_int8", "ann_ndcg_lsh", "ann_hard_negatives",
    "orders_rolling_revenue", "supplier_balance_stats",
    "customers_inactive_since", "events_dow_hour",
    "graph_degree_histogram", "graph_clustering_coeff",
    "events_hourly_interp", "doc_sample_weighted_exact_n",
    "doc_chunk_windows", "part_recency_popularity", "corpus_summary",
    # last checked r1 — stalest re-confirmations
    "multimodal_resize_plan", "multimodal_frame_sample",
    # last checked r2
    "top_parts_by_revenue", "token_count",
    "doc_fingerprint", "order_priority_pivot", "customer_order_seq",
    "parts_intersect_nations", "quantity_quantiles",
    "local_supplier_volume", "part_name_tokens", "orders_monthly_revenue",
    "motif_cooccurrence_topn",
    "dedup_ngram_jaccard", "embedding_near_duplicates",
    # last checked r3 — high-value re-confirmations
    "cooccurrence_pairs", "similarity_jaccard_topk", "customer_cf",
    "hits_fixed10", "dedup_exact", "connected_components",
    "embedding_topk_ivf", "event_funnel", "weekly_retention",
    "events_copresence", "strategy_breakdown_focal",
]


def _reorder_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"window priority names not registered: {missing}"
    ordered = list(_DRIVER_WINDOW_PRIORITY)
    ordered += [n for n in QUERIES if n not in _DRIVER_WINDOW_PRIORITY]
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update({n: snap[n] for n in ordered if n in snap})


_reorder_registry()
