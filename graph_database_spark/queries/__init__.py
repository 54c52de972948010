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
from . import pipeline as _pipeline  # noqa: E402,F401 (after text: splices
#                                      the documents_curated oracle)



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
# ROUND-8 ROTATION: after r7, every entry's latest green external row
# is r7 (the 50-entry r7 window), r6, or r5 — except the five deferred
# in r7 (last green r4) and the two rows-only-by-design entries.
# This window keeps the 10 canaries, leads with the 3 new r8 entries
# (HDR quantile sketch, Bloom decontamination), re-confirms the 5
# deferred r4-stale entries, then 32 of the 40 entries last checked in
# r5 (deferred to r9, all green in the local sweep, coverage carried by
# a windowed twin: motif_cooccurrence_topn + cooccurrence_pairs —
# cooccurrence_topn canary; dedup_exact — dedup_canonical_docs r7 +
# dedup_minhash_lsh canary; token_count — word_counts_cms canary +
# corpus_summary; orders_monthly_revenue — orders_rolling_revenue;
# customers_inactive_since — fk_orphans r7 anti-join coverage;
# doc_chunk_windows — doc_pack_sequences r7; events_dow_hour —
# events_hourly canary + events_hourly_interp windowed). pagerank_global and
# ppr_batch_focal stay out: rows-only (no SQL oracle), tol-stop logic
# externally value-checked r7 via the *_converged_check twins.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked (new r8 entries)
    "events_value_quantile_sketch", "decontaminate_bloom",
    "graph_hyperanf_nf",
    # last checked r4 — the r7 deferrals, now the stalest
    "pii_scan", "doc_split_assignment", "corpus_top_ngrams",
    "customer_value_deciles", "order_baskets",
    # last checked r5 — stalest re-confirmations (32 of 40)
    "ann_hard_negatives", "ann_ndcg_lsh", "connected_components",
    "corpus_summary", "customer_cf", "customer_order_seq",
    "dedup_ngram_jaccard", "doc_fingerprint",
    "doc_sample_weighted_exact_n", "embedding_near_duplicates",
    "embedding_topk_int8", "embedding_topk_ivf", "event_funnel",
    "events_copresence", "events_hourly_interp",
    "graph_clustering_coeff", "graph_degree_histogram", "hits_fixed10",
    "local_supplier_volume", "multimodal_frame_sample",
    "multimodal_resize_plan", "order_priority_pivot",
    "orders_rolling_revenue", "part_name_tokens",
    "part_recency_popularity", "parts_intersect_nations",
    "quantity_quantiles", "similarity_jaccard_topk",
    "strategy_breakdown_focal", "supplier_balance_stats",
    "top_parts_by_revenue", "weekly_retention",
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
