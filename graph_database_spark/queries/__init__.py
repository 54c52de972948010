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
# ROUND-9 ROTATION (latest-green histogram going in: 50 r8, 40 r7,
# 40 r6, 8 r5, plus the never-checked cohort — the 5 new r9 entries
# and pagerank_global / ppr_batch_focal, which carry a direct
# k*-unrolled oracle for the first time this round). This window keeps
# the 10 canaries, leads with the 8 never-checked entries, clears ALL
# 8 r5-stale entries (the r8 verdict's #2), then 24 of the 40 entries
# last checked in r6. The 16 r6 deferrals (to r10) each have an
# in-window or fresher twin:
# dedup_semantic — dedup_semantic_auto (same math, windowed);
# ppr_fixed20_batch — ppr_batch_focal windowed + ppr_converged_check
# r7; embedding_topk_bruteforce — embedding_topk_lsh canary + int8/ivf
# r8; connected_components_star — connected_components r8;
# adjacency_row_norm + cooccurrence_weighted — cooccurrence_topn
# canary + cooccurrence_pairs windowed; graph_vertices — graph_edges
# canary; events_value_histogram — events_value_quantile_sketch r8;
# events_followup_purchase — events_asof_order canary;
# events_props_stats — corpus_summary r8; events_skew_whale_counts —
# events_type_counts_salted r7; pk_violations — fk_orphans r7;
# distinct_reach — displaced by the new vocab_overlap_sources (its
# count-distinct semantics ride vocab_hll_by_source, windowed, and
# corpus_summary r8); order_frequency — displaced by the new
# decontaminate_bloom_pruned (frequency-rollup semantics ride
# part_recency_popularity r8 + top_parts_by_revenue r8); lang_id —
# displaced by the new bpe_train_merges (lang predicate rides
# documents_curated r7 + corpus_summary r8); text_quality — displaced
# by the new bpe_encode_stats (quality scoring rides documents_curated
# r7, doc_quality_ecdf r7, corpus_summary r8 total_quality).
# training_negatives (new late-r9) debuts OUTSIDE the window — locally
# value-gated every round; rotate it into the r10 head with the 16 r6
# deferrals.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked: new r9 entries + the two tol-converged
    # loops that now carry the measured-k* unrolled oracle directly
    "dedup_semantic_auto", "graph_hyperanf_diameter",
    "pagerank_global", "ppr_batch_focal", "vocab_overlap_sources",
    "decontaminate_bloom_pruned", "bpe_train_merges",
    "bpe_encode_stats",
    # last checked r5 — the stalest, all re-confirmed this round
    "cooccurrence_pairs", "customers_inactive_since", "dedup_exact",
    "doc_chunk_windows", "events_dow_hour", "motif_cooccurrence_topn",
    "orders_monthly_revenue", "token_count",
    # last checked r6 — 24 of 40 (rest deferred to r10, twins above)
    "bm25_topk", "dedup_canonical_docs", "dedup_incremental_minhash",
    "dedup_simhash", "doc_unigram_logprob",
    "embedding_truncation_recall", "event_transitions",
    "event_weights_by_user", "events_hourly_gapfill",
    "events_value_trend", "graph_triangle_count", "hybrid_rrf_topk",
    "incidence_pairs", "media_format_detect",
    "multimodal_frame_extract", "multimodal_video_motion",
    "pricing_summary", "recommend_batch",
    "revenue_by_nation", "revenue_rollup", "seed_expansion",
    "shortest_paths_landmark", "sssp_weighted_fixed8",
    "vocab_hll_by_source",
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
