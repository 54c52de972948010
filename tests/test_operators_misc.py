"""Salted join equivalence + spread behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.util import salted_join, spread


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in (["hot"] * 3 + ["cold"])],
        ["k", "v"])
    right = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], ["k", "w"])
    plain = sorted((r["k"], r["v"], r["w"])
                   for r in left.join(right, "k").collect())
    salted = sorted((r["k"], r["v"], r["w"])
                    for r in salted_join(left, right, "k", salt=4).collect())
    assert salted == plain
    assert len(salted) == 800  # hot keys keep their multiplicity


def test_spread_widens_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["x"]).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = spread(df, 8)
    assert wide.rdd.getNumPartitions() == 8
    assert wide.count() == 100


def test_repetition_metrics_values(spark):
    from graph_database_spark.operators.text import repetition_metrics
    docs = spark.createDataFrame(
        [(1, "a b a b a b"),          # 6 words, 2 distinct; bigrams: ab x3, ba x2 → 3/5
         (2, "one two three four"),   # all distinct; every bigram unique → 1/3
         (3, "solo")],                # single word → no bigrams
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert rows[1]["n_words"] == 6
    assert rows[1]["distinct_word_ratio"] == round(2 / 6, 6)
    assert rows[1]["top_bigram_frac"] == 0.6
    assert rows[2]["distinct_word_ratio"] == 1.0
    assert rows[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert rows[3]["n_words"] == 1
    assert rows[3]["top_bigram_frac"] == 0.0


def test_pii_scan_and_redact(spark):
    from graph_database_spark.operators.text import pii_redact, pii_scan
    docs = spark.createDataFrame(
        [(1, "mail bob@example.com and alice@test.org, ip 10.0.0.1"),
         (2, "call 555-867-5309 or 555.867.5309"),
         (3, "clean text, no identifiers")],
        ["doc_id", "text"])
    scans = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (scans[1]["n_email"], scans[1]["n_ipv4"]) == (2, 1)
    assert scans[2]["n_phone"] == 2
    assert (scans[3]["n_email"], scans[3]["n_ipv4"], scans[3]["n_phone"]) \
        == (0, 0, 0)
    clean = {r["doc_id"]: r["clean_text"] for r in pii_redact(docs).collect()}
    assert clean[1] == "mail <EMAIL> and <EMAIL>, ip <IPV4>"
    assert clean[2] == "call <PHONE> or <PHONE>"
    assert clean[3] == "clean text, no identifiers"


def test_kmeans_cluster_stats_partition(spark):
    """Every vector lands in exactly one cell; cohesion is bounded."""
    from graph_database_spark.operators.ann import kmeans_cluster_stats
    from graph_database_spark.sources.testdata import load_table
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [list(r[0]) for r in
             emb.filter(F.col("vec_id") < 16).orderBy("vec_id")
                .select("embedding").collect()]
    stats = kmeans_cluster_stats(emb, cents).collect()
    assert sum(r["n_vectors"] for r in stats) == emb.count()
    assert all(-1.0 <= r["mean_cosine"] <= 1.0 for r in stats)
    assert all(0 <= r["cell"] < 16 for r in stats)


def test_corpus_top_ngrams_counts(spark):
    from graph_database_spark.operators.text import corpus_top_ngrams
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z"), (3, "q")], ["doc_id", "text"])
    # bigrams: doc1 → "x y","y x","x y"; doc2 → "x y","y z"; doc3 → none
    rows = [(r["ngram"], r["n_occurrences"])
            for r in corpus_top_ngrams(docs, n=2, k=2).collect()]
    assert rows == [("x y", 3), ("y x", 1)]  # tie y x < y z broken asc


def test_tfidf_keywords_ranking(spark):
    from graph_database_spark.operators.text import tfidf_keywords
    docs = spark.createDataFrame(
        [(1, "rare common common"), (2, "common common"), (3, "common")],
        ["doc_id", "text"])
    rows = {(r["doc_id"], r["rank"]): r
            for r in tfidf_keywords(docs, top=2).collect()}
    # doc1: rare tf=1 df=1 → 1*3/1=3.0 beats common tf=2 df=3 → 2.0
    assert rows[(1, 1)]["token"] == "rare"
    assert rows[(1, 1)]["tfidf"] == 3.0
    assert rows[(1, 2)]["token"] == "common"
    assert rows[(1, 2)]["tfidf"] == 2.0
    assert rows[(2, 1)]["token"] == "common"
    assert (3, 2) not in rows  # doc3 has a single distinct token


def test_unigram_logprob_matches_hand_model(spark):
    import math
    from graph_database_spark.operators.text import unigram_logprob
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"])
    # corpus: c(a)=2 c(b)=2 c(c)=1, T=5, U=3 → denom ln(5+3+1)=ln 9
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    ln9 = math.log(9)
    exp1 = (2 * round(math.log(3), 9) + round(math.log(3), 9)) / 3 - ln9
    exp2 = (round(math.log(3), 9) + round(math.log(2), 9)) / 2 - ln9
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["avg_logprob"] - exp1) < 1e-6
    assert rows[2]["n_tokens"] == 2
    assert abs(rows[2]["avg_logprob"] - exp2) < 1e-6


def test_unigram_logprob_vocab_cap_floors_oov(spark):
    from graph_database_spark.operators.text import unigram_logprob
    docs = spark.createDataFrame(
        [(1, "hot hot hot rare")], ["doc_id", "text"])
    # vocab_size=1 keeps only 'hot'; 'rare' falls to the OOV ln(1)=0 floor
    capped = {r["doc_id"]: r["avg_logprob"]
              for r in unigram_logprob(docs, vocab_size=1).collect()}
    full = {r["doc_id"]: r["avg_logprob"]
            for r in unigram_logprob(docs).collect()}
    assert capped[1] < full[1]  # OOV floor can only lower the score


def test_temporal_copresence_counts_band_pairs(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.relational_ext import (
        temporal_copresence,
    )
    ev = spark.createDataFrame(
        [(1, 10, DT(2024, 1, 1, 0, 0, 0)),
         (2, 20, DT(2024, 1, 1, 0, 0, 30)),    # 30s after e1 → pair
         (3, 20, DT(2024, 1, 1, 0, 1, 0)),     # 60s after e1 → pair (edge)
         (4, 30, DT(2024, 1, 1, 0, 2, 30)),    # 90s after e3 → no pair
         (5, 10, DT(2024, 1, 1, 0, 0, 30))],   # same ts as e2, diff user
        ["event_id", "user_id", "ts"])
    rows = {(r["user_a"], r["user_b"]): r["n_copresent"]
            for r in temporal_copresence(ev, 60).collect()}
    # (10,20): e1-e2 (30s), e1-e3 (exactly 60s), e5-e3 (30s) = 3;
    # e2-e5 same instant (delta 0) excluded; e2-e3 same user excluded
    assert rows == {(10, 20): 3}


def test_temporal_copresence_crosses_bin_boundary(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.relational_ext import (
        temporal_copresence,
    )
    # 59.5s apart but in adjacent 60s bins (0:59.8 → bin 0, 1:59.3 → bin 1)
    ev = spark.createDataFrame(
        [(1, 1, DT(2024, 1, 1, 0, 0, 59, 800000)),
         (2, 2, DT(2024, 1, 1, 0, 1, 59, 300000))],
        ["event_id", "user_id", "ts"])
    rows = temporal_copresence(ev, 60).collect()
    assert len(rows) == 1 and rows[0]["n_copresent"] == 1


def test_status_history_collapses_runs(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.relational_ext import status_history
    ev = spark.createDataFrame(
        [(1, 7, DT(2024, 1, 1), "view"),
         (2, 7, DT(2024, 1, 2), "view"),      # same status → collapses
         (3, 7, DT(2024, 1, 3), "purchase"),  # change
         (4, 7, DT(2024, 1, 4), "view"),      # change back
         (5, 9, DT(2024, 1, 1), "click")],
        ["event_id", "user_id", "ts", "event_type"])
    rows = sorted(status_history(ev).collect(),
                  key=lambda r: (r["user_id"], r["version"]))
    u7 = [r for r in rows if r["user_id"] == 7]
    assert [r["status"] for r in u7] == ["view", "purchase", "view"]
    # intervals chain: each valid_to equals the next valid_from
    assert u7[0]["valid_to"] == u7[1]["valid_from"]
    assert u7[1]["valid_to"] == u7[2]["valid_from"]
    assert u7[2]["valid_to"] is None          # current row stays open
    assert [r["version"] for r in u7] == [1, 2, 3]
    u9 = [r for r in rows if r["user_id"] == 9]
    assert len(u9) == 1 and u9[0]["valid_to"] is None


def test_recency_decay_halves_per_period(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.popularity import (
        recency_decayed_popularity)
    orders = spark.createDataFrame(
        [(1, DT(2024, 3, 1)),   # anchor (most recent)
         (2, DT(2024, 1, 30)),  # 31 days before → one half-life
         (3, DT(2014, 1, 1))],  # ancient → floored at 1/2^12
        ["o_orderkey", "o_orderdate"])
    items = spark.createDataFrame(
        [(1, 100, 4.0), (2, 100, 4.0), (3, 200, 4096.0)],
        ["order_id", "product_id", "quantity"])
    rows = {r["product_id"]: r
            for r in recency_decayed_popularity(orders, items).collect()}
    assert rows[100]["recency_score"] == 4.0 + 2.0   # fresh + one halving
    assert rows[200]["recency_score"] == 1.0         # 4096 / 2^12 (floor)
    assert rows[100]["n_items"] == 2


def test_winsorized_clips_into_band(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.relational_ext import (
        winsorized_value_stats)
    base = [(i, DT(2024, 1, 1), 1, "buy", 10.0, "{}") for i in range(1, 20)]
    out = [(20, DT(2024, 1, 1), 1, "buy", 10_000.0, "{}"),
           (21, DT(2024, 1, 1), 1, "buy", -10_000.0, "{}")]
    ev = spark.createDataFrame(
        base + out, ["event_id", "ts", "user_id", "event_type", "value",
                     "props"])
    r = winsorized_value_stats(ev).collect()[0]
    assert r["n_events"] == 21
    # both outliers clip to the p05/p95 bounds: sum stays near 19*10
    assert r["lo"] >= -10_000.0 and r["hi"] <= 10_000.0
    assert r["clipped_sum"] == round(19 * 10.0 + r["hi"] + r["lo"], 6)


def test_blocked_name_matches_respects_blocks(spark):
    from graph_database_spark.operators.entity import blocked_name_matches
    df = spark.createDataFrame(
        [(1, "navy blue metallic small box"),
         (2, "navy blue metallic large box"),    # same block, distance 5
         (3, "navy blue chocolate forest mint"),  # same block, far
         (4, "rose gold metallic small box")],    # different block
        ["id", "name"])
    rows = blocked_name_matches(df, "id", "name",
                                prefix_tokens=2, max_distance=6).collect()
    pairs = {(r["src"], r["dst"]): r["distance"] for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] == 5
    # cross-block pair never considered even though names are close
    assert not any(4 in p for p in pairs)
    # in-block pair beyond the distance cap is verified away
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_blocked_name_matches_prunes_oversized_blocks(spark):
    from graph_database_spark.operators.entity import blocked_name_matches
    # 4 members share the degenerate 'the same' prefix; 2 share a rare one
    rows = [(i, f"the same junk prefix variant {i}") for i in range(4)]
    rows += [(10, "rare pair alpha"), (11, "rare pair alphb")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = blocked_name_matches(df, "id", "name", prefix_tokens=2,
                               max_distance=10, max_block_size=3).collect()
    pairs = {(r["src"], r["dst"]) for r in got}
    # the oversized block contributes nothing; the small block survives
    assert pairs == {(10, 11)}
    # cap above the block size: identical to the unguarded result
    ung = blocked_name_matches(df, "id", "name", prefix_tokens=2,
                               max_distance=10).collect()
    cap = blocked_name_matches(df, "id", "name", prefix_tokens=2,
                               max_distance=10, max_block_size=100).collect()
    assert sorted(map(tuple, ung)) == sorted(map(tuple, cap))


def test_bpe_merge_candidates_weighted_by_word_freq(spark):
    from graph_database_spark.operators.text import bpe_merge_candidates
    docs = spark.createDataFrame(
        [(1, "aab aab ccd"), (2, "aab xz")], ["doc_id", "text"])
    rows = {r["pair"]: r["n_occurrences"]
            for r in bpe_merge_candidates(docs, k=10).collect()}
    # 'aab' occurs 3x -> pairs aa, ab each weigh 3; 'ccd' 1x; 'xz' 1x
    assert rows["aa"] == 3 and rows["ab"] == 3
    assert rows["cc"] == 1 and rows["cd"] == 1 and rows["xz"] == 1


def test_bpe_train_greedy_merges_hand_computed(spark):
    """The full trainer on a corpus small enough to run BPE by hand:
    round winners, tie-breaks, frequency weighting, and the greedy
    left-to-right non-overlap rule ('aaa' + merge (a,a) yields ONE
    'aa', never two overlapping) must all match."""
    from graph_database_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaa aaa ab"), (2, "aaa ab ab")], ["doc_id", "text"])
    # vocab: aaa×3, ab×3. round 1 pairs: (a,a)×2 per 'aaa' → 6; (a,b) → 3
    rows = bpe_train(docs, n_merges=3).collect()
    assert [tuple(r) for r in rows][:2] == [
        (1, "a", "a", "aa", 6),
        # after merge: 'aaa' → [aa, a]; pairs now (aa,a)×3 and (a,b)×3 —
        # tie on count 3 breaks on lhs asc: ('a','b') < ('aa','a')
        (2, "a", "b", "ab", 3),
    ]
    assert tuple(rows[2]) == (3, "aa", "a", "aaa", 3)
    # early stop: a fully-merged vocabulary yields fewer rows, no error
    tiny = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    got = bpe_train(tiny, n_merges=5).collect()
    assert [r["merged"] for r in got] == ["ab"]


def test_corpus_summary_values(spark):
    from graph_database_spark.operators.text import corpus_summary
    docs = spark.createDataFrame(
        [(1, "one two three", "en", "s0", 13),
         (2, "four five", "en", "s0", 9),
         (3, "six", "fr", "s1", 3)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    rows = {(r["lang"], r["source"]): r for r in corpus_summary(docs).collect()}
    en = rows[("en", "s0")]
    assert en["n_docs"] == 2 and en["total_tokens"] == 5
    assert en["p50_chars"] == (13 + 9) / 2
    assert rows[("fr", "s1")]["n_docs"] == 1


def test_quality_ecdf_is_inclusive_rank(spark):
    from graph_database_spark.operators.text import quality_ecdf
    # three quality tiers by length: long (high), medium, short (low) ×2
    docs = spark.createDataFrame(
        [(1, "the and of to in is that it was for " * 12),
         (2, "the and of to in is that it was for"),
         (3, "tiny text"), (4, "tiny text")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in quality_ecdf(docs).collect()}
    # ties share the inclusive rank; ordering follows quality
    assert rows[3]["quality_pct"] == rows[4]["quality_pct"] == 0.5
    assert rows[2]["quality_pct"] == 0.75
    assert rows[1]["quality_pct"] == 1.0
    assert rows[3]["quality"] < rows[2]["quality"] < rows[1]["quality"]


def test_quantile_normalize_aligns_sources(spark):
    """Quantile normalization must map each source's rank-r score onto
    the pooled distribution's rank-matched score: two sources with the
    same internal ordering but shifted scales end up on one scale."""
    from graph_database_spark.operators.text import quantile_normalize

    stop10 = "the and of to in is that it was for "
    # stopword-only text of w<100 words scores w/100·0.5 + 0.5 — six
    # distinct, non-saturating scores; books shifted uniformly higher
    docs = spark.createDataFrame(
        [(1, "web", stop10 * 3), (2, "web", stop10 * 2),
         (3, "web", "tiny text"),
         (4, "books", stop10 * 9), (5, "books", stop10 * 6),
         (6, "books", stop10 * 4)],
        ["doc_id", "source", "text"])
    rows = {r["doc_id"]: r for r in quantile_normalize(docs).collect()}
    # within each source the percentiles are 1/3, 2/3, 1
    assert rows[3]["src_pct"] == rows[6]["src_pct"] == 0.333333  # round 6dp
    assert rows[1]["src_pct"] == rows[4]["src_pct"] == 1.0
    # rank-matched docs from the two sources land on the SAME global
    # quantile, even though their raw scores differ
    for a, b in [(1, 4), (2, 5), (3, 6)]:
        assert rows[a]["quality_norm"] == rows[b]["quality_norm"]
    # the normalized value is the pooled score at that percentile — the
    # top of every source maps to the global maximum
    gmax = max(r["quality"] for r in rows.values())
    assert rows[1]["quality_norm"] == rows[4]["quality_norm"] == gmax
    # normalization preserves within-source ordering
    assert (rows[6]["quality_norm"] < rows[5]["quality_norm"]
            < rows[4]["quality_norm"])
