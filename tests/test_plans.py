"""Physical-plan regression tests: the scale properties (column pruning,
filter pushdown, broadcast dimension joins, top-k) must survive refactors."""

from __future__ import annotations

import pytest

from graph_database_spark.registry import AB_QUERIES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(spark, name: str) -> str:
    df = {**QUERIES, **AB_QUERIES}[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_pricing_summary_prunes_columns(spark):
    plan = _formatted_plan(spark, "pricing_summary")
    read = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    # only the 6 referenced lineitem columns reach the scan (of 11)
    assert read.count(":") - 1 <= 6 + 1
    assert "l_orderkey" not in read and "l_shipdate" not in read


def test_cooccurrence_reads_two_columns(spark):
    plan = _formatted_plan(spark, "cooccurrence_topn")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    for r in reads:
        assert "l_orderkey" in r and "l_partkey" in r
        assert "l_extendedprice" not in r


def test_cooccurrence_topn_uses_topk_not_global_sort(spark):
    plan = _formatted_plan(spark, "cooccurrence_topn")
    assert "TakeOrderedAndProject" in plan


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _formatted_plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2


def test_focal_filter_pushed_to_scan(spark):
    plan = _formatted_plan(spark, "customer_cf")
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert any("o_custkey" in l and (
        "EqualTo" in l or "IsNotNull" in l) for l in pushed)


def test_seed_expansion_broadcasts_not_full_pairs(spark):
    """The seed pushdown must hold: no shuffle join of the full item table
    against itself — the seed side broadcasts (see
    seed_expansion_scores_from_items)."""
    plan = _formatted_plan(spark, "seed_expansion")
    assert "BroadcastHashJoin" in plan
    # the pair build would appear as a sort-merge self-join on order_id
    assert "SortMergeJoin" not in plan


def test_recommend_batch_broadcasts_neighbor_lists(spark):
    plan = _formatted_plan(spark, "recommend_batch")
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """S3 bucketing end-to-end: two tables bucketed on the join key join
    without an Exchange on either side — the co-located join the reference
    delegated to Postgres indexes."""
    from graph_database_spark.sources.connectors import save_as_table
    from graph_database_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    # NOTE: restore the captured value, never conf.unset — unset falls
    # back to Spark's hardcoded 10 MB default, not the session's 64 MB,
    # silently degrading every broadcast assertion that runs after
    original_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey")
        items = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey")
        save_as_table(orders, "b_orders", bucket_by=(4, "o_orderkey"))
        save_as_table(items, "b_items", bucket_by=(4, "l_orderkey"))
        j = (spark.table("b_items")
             .join(spark.table("b_orders"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       original_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_interval_join_is_single_hash_join(spark):
    """The band join must ride the user_id equi key — one hash join with
    the time band as its condition, never a cartesian/BNL product."""
    plan = _formatted_plan(spark, "events_followup_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_grouping_sets_single_scan(spark):
    """GROUPING SETS expands via one Expand node over one scan of orders —
    not one aggregation pass per grouping set."""
    plan = _formatted_plan(spark, "revenue_grouping_sets")
    assert plan.count("Expand") >= 1
    # one scan per input table (orders, customer, nation, region) — the
    # Expand means no per-grouping-set rescan of orders (formatted mode
    # prints each scan once in the tree and once in the detail section)
    import re
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 4


def test_inactive_customers_pushes_date_filter(spark):
    """The cutoff predicate must reach the orders parquet scan."""
    plan = _formatted_plan(spark, "customers_inactive_since")
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert any("o_orderdate" in l and "GreaterThanOrEqual" in l
               for l in pushed)


def test_rolling_revenue_broadcasts_dims_and_windows_post_agg(spark):
    """Dims broadcast; the window runs over the aggregated frame, so the
    plan has exactly one shuffle for the groupBy plus the tiny window
    partition-by — never a window over the fact table."""
    plan = _formatted_plan(spark, "orders_rolling_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" in plan


def test_salted_agg_two_levels(spark):
    plan = _formatted_plan(spark, "events_type_counts_salted")
    # phase-1 (type, salt) agg + phase-2 collapse = ≥2 HashAggregate pairs
    assert plan.count("HashAggregate") >= 4


def test_fk_orphans_no_broadcast_of_fact_parent(spark):
    """The lineitem→orders orphan check must shuffle (orders is
    fact-sized); dimension parents broadcast."""
    plan = _formatted_plan(spark, "fk_orphans")
    assert "BroadcastHashJoin" in plan
    # at least one anti join NOT broadcast (the orders parent)
    anti_lines = [l for l in plan.split("\n") if "LeftAnti" in l]
    assert any("Broadcast" not in l for l in anti_lines), anti_lines


def test_jaccard_caps_fanout_below_self_join(spark):
    """The per-customer top-m truncation (cap_products_per_customer) must
    sit BELOW the customer-keyed self-join: the plan contains a row_number
    Window, and the join consumes its filtered output — the k² skew guard."""
    plan = _formatted_plan(spark, "similarity_jaccard_topk")
    assert "Window" in plan
    assert "row_number" in plan
    # formatted-plan node ids number bottom-up, so "window BELOW the
    # self-join" means the first Window id is smaller than every join id
    import re
    win_ids = [int(x) for x in re.findall(r"^\((\d+)\) Window", plan, re.M)]
    join_ids = [int(x) for x in re.findall(
        r"^\((\d+)\) [\w]*(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
        plan, re.M)]
    assert win_ids and join_ids
    assert min(win_ids) < min(join_ids), (win_ids, join_ids)


def test_ngram_dedup_has_stop_shingle_anti_join(spark):
    """The registered dedup_ngram_jaccard must run with the skew guard ON:
    hot shingles (doc-freq > cap) removed via anti-join before the
    shingle self-join."""
    plan = _formatted_plan(spark, "dedup_ngram_jaccard")
    assert "LeftAnti" in plan, plan


def test_graph_sink_partition_pruning(spark, tmp_path):
    """Edges written rel_type-partitioned must prune at the directory
    level: a rel_type filter shows up as a PartitionFilter, not a data
    filter over all files."""
    from graph_database_spark.sources.connectors import write_graph, read_graph
    from graph_database_spark.sources.toy import toy_dataset
    from graph_database_spark.graphs.api import PropertyGraph
    from pyspark.sql import functions as F

    t = toy_dataset(spark)
    g = PropertyGraph.from_tables(t["customers"], t["categories"],
                                  t["products"], t["orders"],
                                  t["order_items"], events=t["events"])
    path = str(tmp_path / "pg")
    write_graph(g.vertices, g.edges, path)
    _, edges = read_graph(spark, path)
    q = edges.filter(F.col("rel_type") == "CONTAINS")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    part = [l for l in plan.split("\n") if "PartitionFilters" in l]
    assert part and any("rel_type" in l for l in part), plan
    assert q.count() == g.edges.filter("rel_type = 'CONTAINS'").count()


def test_pii_scan_zero_shuffle(spark):
    """PII counting is a pure row-local projection: no Exchange anywhere."""
    plan = _formatted_plan(spark, "pii_scan")
    assert "Exchange" not in plan


def test_mixture_plan_broadcasts_grand_total(spark):
    """The 1-row grand total joins back via broadcast, never a shuffle of
    the stratum counts against it."""
    plan = _formatted_plan(spark, "domain_mixture_plan")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cluster_sizes_broadcasts_centroids(spark):
    """The centroid table is broadcast; the member-vector side is never
    the build side of a shuffle join."""
    plan = _formatted_plan(spark, "embedding_cluster_sizes")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_shuffles_only_on_doc_id(spark):
    """Both aggregations and the metric join key on doc_id/(doc_id,bigram)
    — no join of the corpus against anything but its own aggregates."""
    plan = _formatted_plan(spark, "doc_repetition")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_profile_single_scan(spark):
    """All per-column statistics come from ONE scan of the table — a
    per-column rescan would multiply 100 TB of IO by the column count."""
    import re
    plan = _formatted_plan(spark, "orders_profile")
    # the formatted dump names each scan once in the tree and once in the
    # node details — count the detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_minhash_signatures_pure_projection(spark):
    """After the map-side rewrite the signature stage must stay a pure
    projection: no aggregate, and the only Exchange is the round-robin
    `spread` repartition (never a hash shuffle of (doc, shingle) rows)."""
    from graph_database_spark.operators.dedup import minhash_signatures
    from graph_database_spark.sources.testdata import load_table
    sig = minhash_signatures(load_table(spark, SF_DIR, "documents"))
    plan = sig._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "hashpartitioning" not in plan  # only REPARTITION_BY_NUM round-robin


def test_recency_popularity_broadcasts_anchor(spark):
    plan = _formatted_plan(spark, "part_recency_popularity")
    assert "BroadcastExchange" in plan        # 1-row anchor date
    assert "CartesianProduct" not in plan


def test_winsorized_broadcasts_bounds(spark):
    plan = _formatted_plan(spark, "events_value_winsorized")
    assert "BroadcastExchange" in plan        # per-type p05/p95 bounds
    # the fact side is scanned twice (bounds + clip) but never self-joined
    assert "SortMergeJoin" not in plan


def test_status_history_single_shuffle(spark):
    """Both windows share (user_id → ts, event_id); the plan must carry
    ONE hash exchange on user_id, not one per window."""
    plan = _formatted_plan(spark, "events_status_history")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "Arguments: hashpartitioning(user_id" in plan


def test_copresence_is_equi_join_on_bins(spark):
    """The keyless range join must execute as an equi join on time bins —
    a CartesianProduct / nested-loop fallback is exactly what the bin
    bucketing exists to avoid."""
    plan = _formatted_plan(spark, "events_copresence")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_logprob_broadcasts_vocab(spark):
    """The per-token vocab join must be broadcast (the cap bounds the
    vocab side) and the top-V selection must be a TakeOrderedAndProject,
    never a global sort of the count table."""
    plan = _formatted_plan(spark, "doc_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_doc_prefix_matches_equi_join_only(spark):
    """Blocking must reach the join as an equi key — a fallback to a
    nested-loop/cartesian verify stage would be the quadratic all-pairs
    join the operator exists to avoid."""
    plan = _formatted_plan(spark, "doc_prefix_matches")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tune_session_restores_broadcast_threshold(spark):
    """tune_session must raise autoBroadcastJoinThreshold on an externally
    provided session (the driver's session path): at the 10 MB Spark
    default, dimension joins the other plan tests assume broadcast can
    degrade to shuffles. Simulated here by resetting the shared session to
    the default before tuning."""
    from graph_database_spark.session import tune_session

    key = "spark.sql.autoBroadcastJoinThreshold"
    original = spark.conf.get(key)
    try:
        spark.conf.set(key, str(10 * 1024 * 1024))
        tune_session(spark)
        assert int(spark.conf.get(key)) == 64 * 1024 * 1024
        plan = _formatted_plan(spark, "revenue_by_nation")
        assert plan.count("BroadcastHashJoin") >= 2
    finally:
        spark.conf.set(key, original)


def test_quantile_norm_histogram_frames_broadcast(spark):
    """The percentile→quantile lookup must be histogram×histogram with
    broadcast (never corpus-sized), the corpus scan pruned to the two
    referenced columns, and the only single-partition exchanges the
    bounded-cardinality histogram cum-sums."""
    # other test modules cache the documents table; a cache hit swaps the
    # pruned FileScan for a full-schema InMemoryRelation and breaks the
    # pruning assertion, so pin the plan to the real scan
    spark.catalog.clearCache()
    plan = _formatted_plan(spark, "doc_quality_quantile_norm")
    assert "BroadcastNestedLoopJoin" in plan  # gpct >= pct histogram join
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    # column pruning: unreferenced document columns never reach any scan
    assert reads and all(
        "lang" not in r and "n_chars" not in r for r in reads)
    # global row sort of the corpus would appear as a Sort over the scan
    # without a partition key; the only SinglePartition exchanges feed the
    # two histogram windows
    assert plan.count("Exchange SinglePartition") <= 2


def test_cms_sketch_combines_map_side_and_broadcasts(spark):
    """The count-min build must partial-aggregate before the exchange
    (shuffle ≤ depth·width rows per partition) and the probe join must
    broadcast the sketch, not shuffle the corpus again."""
    plan = _formatted_plan(spark, "word_counts_cms")
    assert "partial_count" in plan  # map-side combine on (depth, slot)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skew_whale_counts_salted_and_broadcast_topn(spark):
    """The zipfian-whale entry must (a) spread the hot key: phase-1
    aggregate keyed on __salt before the (user, type) collapse, and
    (b) apply the top-20 user filter as a broadcast semi-join, never a
    shuffle of the counts side."""
    plan = _formatted_plan(spark, "events_skew_whale_counts")
    # the salt key survives into the phase-1 grouping (Catalyst folds the
    # __salt alias into a _groupingexpression, so match the expression)
    assert "pmod(event_id" in plan
    assert plan.count("HashAggregate") >= 4
    # formatted explain echoes the join type in a "Join type: LeftSemi"
    # node-detail line with no operator name — restrict to tree lines
    # (operator nodes) so the detail echo can't fail the assertion
    semi = [l for l in plan.split("\n") if "Join LeftSemi" in l]
    assert semi and all("Broadcast" in l for l in semi), semi
    assert "TakeOrderedAndProject" in plan  # top-20 by total, no global sort


def test_tfidf_plan_shape(spark):
    """Pin doc_tfidf_keywords' efficient shape (VERDICT r4 #4 follow-up:
    the r4 1.32->1.57s move was host noise — calibration moved the same
    ratio — but the shape deserves a regression net): pruned 2-column
    scans, the vocab-sized df side broadcast into the tf join, and the
    per-doc top-3 as WindowGroupLimit, never a global sort. The corpus
    is scanned twice by design (tf + df); exchange reuse can't merge
    them because Catalyst prunes the df side's inner count into a
    distinct — a measured wash vs persisting the doc-term frame (1.37s
    vs 1.43s at sf0.1) without the cache side-effects."""
    plan = _formatted_plan(spark, "doc_tfidf_keywords")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l
             and "documents" not in l]
    for r in [l for l in plan.split("\n") if "ReadSchema" in l]:
        assert "title" not in r and "url" not in r, r  # only doc_id+text
    assert "BroadcastHashJoin" in plan        # df join is broadcast
    assert "WindowGroupLimit" in plan         # top-3 per doc, rank-limited
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row n_docs total


def test_bm25_plan_shape(spark):
    """BM25's scale posture (r10 shape): exactly ONE pruned
    (doc_id,text) corpus scan, and the scan never SHUFFLES — per-doc tf
    is computed row-locally off the tokenized array (one conditional
    size() per query term), so the only wide operations left are the
    1-row stats broadcast and the final per-(query,doc) aggregation;
    df and the term→query_ids map are plan literals (no broadcast-join
    jobs). Per-query top-10 is rank-limited, never a global sort."""
    plan = _formatted_plan(spark, "bm25_topk")
    # the scoring plan reads ONLY the checkpointed per-doc frame — the
    # corpus was scanned exactly once, at its materialization, and never
    # again no matter how often the diamonds reference it
    assert not [l for l in plan.split("\n")
                if "ReadSchema" in l and "text" in l]
    assert "Scan ExistingRDD" in plan
    # zero join operators except the 1-row stats ride (broadcast NLJ):
    # df/query_id attachment are literals, dl rides the row
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast NLJ


def test_bm25_materialized_frames_are_small_and_pruned(spark):
    """The frames bm25_topk pins with localCheckpoint must stay SMALL
    (|docs|-row dl, query-term-bounded tf, and the masked aggregate
    that bounds both) — checkpointing the vocabulary×docs postings
    would trade scans for a worse materialization. Also pin that the
    corpus scan underneath is pruned to doc_id+text."""
    from pyspark.sql import functions as F
    from graph_database_spark.sources.testdata import load_table
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    toks = (docs.select("doc_id",
                        F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                          r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    plan = dl._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert reads and all("doc_id" in r and "text" in r and "title" not in r
                         and "url" not in r for r in reads)
    assert dl.count() <= n_docs


def test_bm25_postings_path_never_scans_corpus(spark):
    """With a persisted postings (inverted-index) table passed in, the
    query plan derives every statistic from it — zero document scans."""
    from graph_database_spark.operators.text import bm25_postings, bm25_topk
    from graph_database_spark.sources.testdata import load_table
    docs = load_table(spark, SF_DIR, "documents")
    post = bm25_postings(docs).localCheckpoint()
    qdf = spark.createDataFrame(
        [(1, "the"), (1, "data")], "query_id int, term string")
    out = bm25_topk(docs, qdf, postings=post)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert not [l for l in plan.split("\n")
                if "ReadSchema" in l and "text" in l]
    assert "ExistingRDD" in plan
    # postings-path parity with the from-corpus path
    from_corpus = {tuple(r) for r in bm25_topk(docs, qdf).collect()}
    assert {tuple(r) for r in out.collect()} == from_corpus


def test_media_format_detect_is_pure_expressions(spark):
    """Magic-byte detection must run entirely JVM-side: a CASE chain of
    binary substring compares — no Python eval node of any kind — with
    only the referenced document columns reaching the scan."""
    spark.catalog.clearCache()
    plan = _formatted_plan(spark, "media_format_detect")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # formatted mode marks codegen'd nodes with '*' — the projection
    # chain must be inside a codegen stage
    assert "* Project" in plan
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert reads and all("title" not in r and "url" not in r
                         and "lang" not in r for r in reads)
    assert "Exchange" not in plan  # narrow projection: zero shuffles


def test_dedup_semantic_bounded_self_join(spark):
    """SemDeDup's quadratic step must be keyed on the cell (shuffle or
    broadcast hash join on the cluster id — never a cartesian product),
    and the centroid table must come in as a broadcast."""
    spark.catalog.clearCache()
    plan = _formatted_plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair join is a cell-keyed equi join (the assignment+centroid
    # stage sits behind the localCheckpoint, so this plan is exactly the
    # quadratic step); its equi keys must include the cell
    import re
    joins = re.findall(r"Left keys(?:.*)\: \[(.*)\]", plan)
    assert any("cell" in k for k in joins), joins


def test_event_transitions_single_fact_shuffle(spark):
    """The lag window shuffles the fact table ONCE on user_id; the
    row-normalizing window then runs over the |types|^2 aggregate, never
    the fact table — pin that no second fact-sized exchange exists."""
    plan = _formatted_plan(spark, "event_transitions")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert len(reads) == 1
    # pruned scan: only the 3 window/agg inputs + event_type
    assert "value" not in reads[0] and "props" not in reads[0]
    # exactly one hashpartitioning exchange on user_id (the lag window);
    # every later exchange keys on the prev/next types (types^2-sized
    # frame). Formatted explain puts partition keys on the node-detail
    # "Arguments:" line, not the tree line.
    ex = [l for l in plan.split("\n") if "hashpartitioning" in l]
    assert sum("user_id" in l for l in ex) == 1
    assert all("user_id" in l or "prev" in l for l in ex), ex


def test_events_value_trend_is_one_pass(spark):
    """Closed-form OLS: one pruned scan, one aggregate keyed by
    event_type (map-side partials), a 1-row broadcast for the corpus
    min-timestamp — no window, no join, no second fact scan."""
    plan = _formatted_plan(spark, "events_value_trend")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    # ts/value/event_type only, read for the agg and the 1-row min(ts)
    for r in reads:
        assert "props" not in r and "user_id" not in r, r
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row t0 frame
    assert "SortMergeJoin" not in plan


def test_hybrid_rrf_fuses_topk_frames_only(spark):
    """RRF fusion never rescans the corpus: documents is scanned once
    (the BM25 explode), embeddings twice (queries + corpus side of the
    brute-force arm), and the fusion join runs over k-rows-per-query
    frames with both arms' top-k as WindowGroupLimit partials."""
    plan = _formatted_plan(spark, "hybrid_rrf_topk")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    # the BM25 arm's dl/tf frames are checkpointed inside bm25_topk, so
    # the fused plan carries ZERO parquet document scans (the corpus was
    # read exactly twice, at materialization) — down from the 4
    # re-derived scans of the r6 shape.
    doc_reads = [l for l in reads if "doc_id" in l and "text" in l]
    assert doc_reads == [], doc_reads
    assert "Scan ExistingRDD" in plan
    assert "WindowGroupLimit" in plan
    # the dense arm broadcasts the 3-row query-vector side
    assert "BroadcastNestedLoopJoin Cross" in plan


def test_pipeline_composite_runs_off_stage_checkpoints(spark):
    """The 6-stage curation composite's final plan must read ONLY the
    stage-boundary checkpoints: the mixture filter + packing windows run
    over the s4 survivor frame, never re-deriving curation, dedup, or
    SemDeDup lineage (documents was scanned exactly twice, at curation
    materialization; embeddings twice)."""
    plan = _formatted_plan(spark, "pipeline_curate_pack")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert reads == [], reads  # zero parquet scans in the final plan
    assert "Scan ExistingRDD" in plan
    # per-stratum packing: both windows partition on source (never a
    # global single-partition window)
    assert "Window" in plan and "CartesianProduct" not in plan


def test_bm25_duplicate_query_terms_do_not_double_count(spark):
    """A duplicated (query_id, term) row must score identically to the
    deduped query on BOTH the corpus path and the postings path."""
    from graph_database_spark.operators.text import bm25_postings, bm25_topk
    from graph_database_spark.sources.testdata import load_table
    docs = load_table(spark, SF_DIR, "documents")
    qdf1 = spark.createDataFrame(
        [(1, "the"), (1, "data")], "query_id int, term string")
    qdf2 = spark.createDataFrame(
        [(1, "the"), (1, "the"), (1, "data"), (1, "data")],
        "query_id int, term string")
    want = {tuple(r) for r in bm25_topk(docs, qdf1).collect()}
    assert {tuple(r) for r in bm25_topk(docs, qdf2).collect()} == want
    post = bm25_postings(docs).localCheckpoint()
    assert {tuple(r) for r in
            bm25_topk(docs, qdf2, postings=post).collect()} == want


def test_recommend_batch_single_customer_exchange(spark):
    """r13 exchange collapse: the explicit repartition(N, customer_id) on
    the incidence frame is the ONLY exchange downstream of the incidence
    checkpoint — the (customer_id, product_id) score aggregate and the
    per-customer rank window both reuse its subset-key partitioning, and
    the old plan's two exchanges of the x30-expanded frame are gone."""
    import re
    plan = _formatted_plan(spark, "recommend_batch")
    exch_keys = [m.group(1) for m in re.finditer(
        r"\(\d+\) Exchange\nInput.*\nArguments: hashpartitioning\(([^)]*)\)",
        plan)]
    cust_keyed = [k for k in exch_keys if "customer_id" in k]
    # no exchange keyed on the full (customer_id, product_id) pair — that
    # was the collapsed aggregate exchange
    assert not any("product_id" in k for k in cust_keyed), exch_keys
    # exactly one customer_id-keyed exchange (the explicit repartition);
    # the remaining exchanges all belong to the broadcast-side
    # co-occurrence pair build
    assert len(cust_keyed) == 1, exch_keys


def test_pipeline_checkpoints_text_payload_exactly_twice(spark):
    """r13 stage fusion: only the curation scan and the exact-dedup
    survivors (s2) materialize the text payload; the old s3 checkpoint
    (CC-canonical survivors) re-copied every surviving text byte and is
    now a fused broadcast semi-join re-derived by its consumers."""
    from pyspark.sql.classic.dataframe import DataFrame
    from graph_database_spark.registry import QUERIES

    text_ckpts = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        if "text" in self.columns:
            text_ckpts.append(tuple(self.columns))
        return orig(self, eager)

    DataFrame.localCheckpoint = spy
    try:
        QUERIES["pipeline_curate_pack"](spark, SF_DIR)
    finally:
        DataFrame.localCheckpoint = orig
    assert len(text_ckpts) == 2, text_ckpts
