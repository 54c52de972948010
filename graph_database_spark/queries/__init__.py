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
# ROUND-6 ROTATION: after r5 every entry except the four round-5
# additions had at least one green external row. This window keeps the
# 10 canaries, leads with the 4 r5 additions plus the new r6 entries
# (closing external coverage to all registered entries), then fills
# with the stalest oracle-backed re-confirmations (last checked r3,
# then the 8 highest-value r4 entries). pagerank_global and
# ppr_batch_focal stay out: they have no SQL oracle (iterative), so a
# window slot would burn a hash-checkable row on a rows-only check.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked (r5 additions + new r6 entries)
    "events_skew_whale_counts", "multimodal_video_motion",
    "multimodal_frame_extract", "bm25_topk", "media_format_detect",
    "dedup_semantic", "vocab_hll_by_source", "event_transitions",
    "events_value_trend", "hybrid_rrf_topk", "embedding_truncation_recall",
    # last checked r3 — stalest re-confirmations (all 27)
    "adjacency_row_norm", "event_weights_by_user", "incidence_pairs",
    "distinct_reach", "order_frequency", "seed_expansion",
    "recommend_batch", "cooccurrence_weighted", "pricing_summary",
    "revenue_by_nation", "revenue_rollup", "pk_violations",
    "events_props_stats", "events_value_histogram",
    "events_followup_purchase", "events_hourly_gapfill",
    "graph_vertices", "shortest_paths_landmark", "ppr_fixed20_batch",
    "graph_triangle_count", "dedup_simhash", "embedding_topk_bruteforce",
    "dedup_canonical_docs", "dedup_incremental_minhash", "lang_id",
    "text_quality", "doc_unigram_logprob",
    # last checked r4 — highest-value re-confirmations (doc_tfidf_keywords,
    # word_heavy_hitters, graph_lpa_communities and graph_kcore rotated out
    # mid-r6 to admit the four new entries; all retain earlier green rows +
    # the local sweep)
    "connected_components_star", "sssp_weighted_fixed8",
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
