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
# ROUND-11 ROTATION (latest-green histogram going in: 50 r10, 38 r9,
# 40 r8, 19 r7; registry 147 → 146 this round — dedup_semantic demoted
# to AB_QUERIES per r10 verdict next-round #7 option (a), so the one
# deliberately-quadratic pedagogical baseline is no longer invocable
# through the driver surface; it stays value-gated locally and measured
# in the scaling A/B appendix). Per r10 verdict next-round #1 the
# window is exactly: ALL 19 r7-stale entries first (the oldest cohort,
# 3 rounds stale — the arithmetic floor at 147/50), then 31 of the 40
# r8-stale entries oldest-first. No canaries this round — all 10 are
# r10-green and the verdict's 19+31=50 arithmetic leaves them no slot;
# each has a same-path twin in-window (cooccurrence_viz_edges reuses
# cooccurrence_topn's core, pagerank_converged_check/ppr_converged_check
# cover the PageRank loop, decontaminate_ngram the shingle path,
# word_heavy_hitters the CMS scan, ann_recall_lsh the LSH probe,
# documents_curated the curation gate, events_type_counts_salted the
# events scan). The 9 r8 deferrals (to r12) each have an in-window or
# fresher twin: ann_ndcg_lsh — ann_recall_lsh in-window (same LSH arm,
# same exact top-k join); connected_components — connected_components_star
# r10 (identical answer by construction); customer_value_deciles —
# quantity_quantiles in-window + doc_quality_ecdf/quantile_norm
# in-window (same windowed-quantile core); decontaminate_bloom —
# decontaminate_ngram in-window (identical exact answer) +
# decontaminate_bloom_pruned r9; doc_sample_weighted_exact_n —
# doc_sample_exact_n + doc_sample_quality_weighted in-window (same A-ES
# core); multimodal_frame_sample + multimodal_resize_plan —
# multimodal_features in-window (same codec core) + dedup_image_phash
# r10; strategy_breakdown_focal — recommend_focal_blend r10 (same
# engine, strict superset of arms); top_parts_by_revenue —
# shipping_priority in-window (same lineitem⋈orders scan/agg shape) +
# revenue_by_nation r9. After this round the histogram is r8:9, r9:38,
# r10:50, r11:50 — max staleness 3 rounds, r7 cohort emptied.
_DRIVER_WINDOW_PRIORITY = [
    # the full r7-stale cohort (oldest, 3 rounds) — all 19
    "ann_recall_lsh", "bpe_merge_candidates", "cooccurrence_viz_edges",
    "decontaminate_ngram", "doc_quality_ecdf",
    "doc_quality_quantile_norm", "doc_sample_exact_n",
    "doc_sample_quality_weighted", "documents_curated",
    "events_type_counts_salted", "fk_orphans", "multimodal_features",
    "nation_revenue_share", "orders_profile",
    "pagerank_converged_check", "ppr_converged_check",
    "revenue_grouping_sets", "shipping_priority", "word_heavy_hitters",
    # r8-stale cohort, oldest-first — 31 of 40 (9 deferred, twins above)
    "ann_hard_negatives", "corpus_summary", "corpus_top_ngrams",
    "customer_cf", "customer_order_seq", "dedup_ngram_jaccard",
    "doc_fingerprint", "doc_split_assignment",
    "embedding_near_duplicates", "embedding_topk_int8",
    "embedding_topk_ivf", "event_funnel", "events_copresence",
    "events_hourly_interp", "events_value_quantile_sketch",
    "graph_clustering_coeff", "graph_degree_histogram",
    "graph_hyperanf_nf", "hits_fixed10", "local_supplier_volume",
    "order_baskets", "order_priority_pivot", "orders_rolling_revenue",
    "part_name_tokens", "part_recency_popularity",
    "parts_intersect_nations", "pii_scan", "quantity_quantiles",
    "similarity_jaccard_topk", "supplier_balance_stats",
    "weekly_retention",
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
