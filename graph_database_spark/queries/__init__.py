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
# ROUND-7 ROTATION: after r6 all 130 then-registered entries had ≥1
# green external row and max staleness was 2 rounds (the r4 cohort).
# This window keeps the 10 canaries, leads with ALL 7 new r7 entries
# (the tol-converged PageRank value checks, the 6-stage curation
# composite, image dHash + audio envelope dedup, temperature mixture,
# the Q9 viz edges), then re-confirms 33 of the 38 entries last checked
# in r4 (deferred to r8: pii_scan — vacuous agreement,
# doc_split_assignment — trivial-hash coverage, corpus_top_ngrams —
# overlaps word_heavy_hitters' top-k token coverage,
# customer_value_deciles — overlaps customer_rfm/quantity_quantiles'
# window-rank coverage, order_baskets — overlaps order_frequency;
# all five green in the local sweep). pagerank_global and
# ppr_batch_focal stay out:
# rows-only (no SQL oracle), and their tol-stop logic is now externally
# value-checked via the *_converged_check twins in this window.
_DRIVER_WINDOW_PRIORITY = [
    # canaries (kept every round)
    "cooccurrence_topn", "recommend_focal_blend", "events_hourly",
    "sessionization", "events_asof_order", "graph_edges",
    "pagerank_fixed20", "dedup_minhash_lsh",
    "embedding_topk_lsh", "word_counts_cms",
    # never driver-checked (new r7 entries)
    "pagerank_converged_check", "ppr_converged_check",
    "pipeline_curate_pack", "dedup_image_phash", "dedup_audio_envelope",
    "domain_mixture_temperature", "cooccurrence_viz_edges",
    # last checked r4 — stalest re-confirmations (33 of 38)
    "shipping_priority", "revenue_grouping_sets", "nation_revenue_share",
    "customer_rfm", "fk_orphans",
    "orders_profile", "events_value_anomalies",
    "events_type_counts_salted", "events_sliding_counts",
    "events_status_history", "events_value_winsorized", "graph_kcore",
    "graph_lpa_communities", "graph_neighbor_agg",
    "dedup_winnow_substrings", "ann_recall_lsh", "multimodal_features",
    "embedding_cluster_sizes", "doc_quality_ecdf", "doc_sample_exact_n",
    "doc_sample_stratified", "decontaminate_ngram", "documents_curated",
    "doc_repetition", "domain_mixture_plan", "doc_sample_quality_weighted",
    "doc_shards_by_tokens", "word_heavy_hitters",
    "doc_tfidf_keywords", "doc_prefix_matches", "bpe_merge_candidates",
    "doc_pack_sequences", "doc_quality_quantile_norm",
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
