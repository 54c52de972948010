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
# ROUND-10 ROTATION (latest-green histogram going in: 50 r9, 40 r8,
# 40 r7, 16 r6, 1 never — training_negatives, which debuted after the
# r9 window froze). Registry growth is FROZEN this round (r9 verdict
# #1): at 147 entries / 50 slots, every addition raises steady-state
# staleness. This window leads with training_negatives (the only
# never-checked entry), clears ALL 16 r6-stale entries, re-verifies
# the 3 entries whose behavior changes this round
# (dedup_semantic_auto → two-level coarse-quantizer assignment;
# hybrid_rrf_topk → int8 dense arm; embedding_cluster_sizes → pinned
# stored centroids), then 20 more of the 40 r7-stale entries. The 19
# r7 deferrals (to r11) each have an in-window or fresher twin:
# ann_recall_lsh — embedding_topk_lsh canary + ann_ndcg_lsh r8;
# bpe_merge_candidates — bpe_train_merges r9 (full trainer);
# cooccurrence_viz_edges — cooccurrence_topn + graph_edges canaries;
# decontaminate_ngram — decontaminate_bloom_pruned r9 (identical
# exact answer by construction); doc_quality_ecdf +
# doc_quality_quantile_norm — text_quality windowed +
# customer_value_deciles / quantity_quantiles r8; doc_sample_exact_n
# + doc_sample_quality_weighted — doc_sample_weighted_exact_n r8
# (same A-ES core) + training_negatives windowed (hash-draw);
# documents_curated — pipeline_curate_pack windowed (contains the
# curation stage verbatim); events_type_counts_salted —
# events_skew_whale_counts windowed; fk_orphans — pk_violations
# windowed; multimodal_features — dedup_image_phash windowed (same
# PPM decode core) + multimodal_frame_sample r8; nation_revenue_share
# — revenue_by_nation r9; orders_profile — pricing_summary +
# orders_monthly_revenue r9; pagerank_converged_check —
# pagerank_global r9 (identical k*-unrolled oracle);
# ppr_converged_check — ppr_batch_focal r9 + ppr_fixed20_batch
# windowed; revenue_grouping_sets — revenue_rollup r9;
# shipping_priority — top_parts_by_revenue + local_supplier_volume
# r8; word_heavy_hitters — word_counts_cms canary.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked (debuted late r9)
    "training_negatives",
    # behavior changes this round — must re-verify externally
    "dedup_semantic_auto", "hybrid_rrf_topk", "embedding_cluster_sizes",
    # last checked r6 — the full stale cohort, all 16
    "adjacency_row_norm", "connected_components_star",
    "cooccurrence_weighted", "dedup_semantic", "distinct_reach",
    "embedding_topk_bruteforce", "events_followup_purchase",
    "events_props_stats", "events_skew_whale_counts",
    "events_value_histogram", "graph_vertices", "lang_id",
    "order_frequency", "pk_violations", "ppr_fixed20_batch",
    "text_quality",
    # last checked r7 — 20 of 40 (rest deferred to r11, twins above)
    "customer_rfm", "dedup_audio_envelope", "dedup_image_phash",
    "dedup_winnow_substrings", "doc_pack_sequences",
    "doc_prefix_matches", "doc_repetition", "doc_sample_stratified",
    "doc_shards_by_tokens", "doc_tfidf_keywords",
    "domain_mixture_plan", "domain_mixture_temperature",
    "events_sliding_counts", "events_status_history",
    "events_value_anomalies", "events_value_winsorized",
    "graph_kcore", "graph_lpa_communities", "graph_neighbor_agg",
    "pipeline_curate_pack",
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
