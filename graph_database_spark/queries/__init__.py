"""Per-domain query registry package.

Importing this package registers every query: each domain module's
import runs its @register decorators (the ORDER of the domain imports
only affects names beyond the driver window — the window head is pinned
by _DRIVER_WINDOW_PRIORITY below)."""

from __future__ import annotations

from ._shared import (
    AB_ORACLES, AB_QUERIES, ORACLES, QUERIES, QueryFn, register,
    register_ab,
)

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
# ROUND-12 ROTATION (latest-green histogram going in: 50 r11, 50 r10,
# 38 r9, 9 r8; registry steady at 146 — r11 verdict next-round #8
# freezes it, and #2 prescribes this window exactly). The window is:
# ALL 9 r8-stale entries first (the oldest cohort, 3 rounds stale —
# the r11 deferrals, each named in the r11 verdict's What's-missing
# #2), then the ENTIRE 38-entry r9 cohort (emptying it), then the 3
# oldest r10 entries. "Oldest r10" = smallest prior-green round before
# r10 (computed from CORRECTNESS_r01–r09): training_negatives was
# FIRST checked in r10 (no prior green — the single never-re-verified
# entry), then the prior-r6 group alphabetically: adjacency_row_norm
# and connected_components_star — the latter doubling as the r11
# verdict #7 regression watch (1.26× normalized with an "unchanged"
# inner loop), so its driver row this round re-confirms values while
# the bench row isolates the perf cause. After this round the
# histogram is r10:47, r11:49, r12:50 — max staleness 2 rounds, the
# r8 and r9 cohorts both emptied, every registry entry re-verified
# within the last two rounds.
_DRIVER_WINDOW_PRIORITY = [
    # the full r8-stale cohort (oldest, 3 rounds) — all 9
    "ann_ndcg_lsh", "connected_components", "customer_value_deciles",
    "decontaminate_bloom", "doc_sample_weighted_exact_n",
    "multimodal_frame_sample", "multimodal_resize_plan",
    "strategy_breakdown_focal", "top_parts_by_revenue",
    # the full r9-stale cohort — all 38
    "bm25_topk", "bpe_encode_stats", "bpe_train_merges",
    "cooccurrence_pairs", "customers_inactive_since",
    "decontaminate_bloom_pruned", "dedup_canonical_docs", "dedup_exact",
    "dedup_incremental_minhash", "dedup_simhash", "doc_chunk_windows",
    "doc_unigram_logprob", "embedding_truncation_recall",
    "event_transitions", "event_weights_by_user", "events_dow_hour",
    "events_hourly_gapfill", "events_value_trend",
    "graph_hyperanf_diameter", "graph_triangle_count",
    "incidence_pairs", "media_format_detect", "motif_cooccurrence_topn",
    "multimodal_frame_extract", "multimodal_video_motion",
    "orders_monthly_revenue", "pagerank_global", "ppr_batch_focal",
    "pricing_summary", "recommend_batch", "revenue_by_nation",
    "revenue_rollup", "seed_expansion", "shortest_paths_landmark",
    "sssp_weighted_fixed8", "token_count", "vocab_hll_by_source",
    "vocab_overlap_sources",
    # 3 oldest-r10 entries (prior-green r0/r6/r6)
    "training_negatives", "adjacency_row_norm",
    "connected_components_star",
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
