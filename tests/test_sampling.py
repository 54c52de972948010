"""Deterministic sampling/split/decontamination operators: invariance
properties plus plan shape (the value-level oracle gate lives in
test_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.sampling import (
    assign_split, hash_bucket, ngram_contamination, stratified_sample,
)
from graph_database_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_split_stable_under_repartition(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["split"]
         for r in assign_split(docs).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_split(docs.repartition(13))
         .select("doc_id", "split").collect()}
    assert a == b
    # roughly 80/10/10 (hash uniformity at 500 docs: generous bounds)
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * n < train < 0.9 * n
    assert set(a.values()) == {"train", "val", "test"}


def test_split_stable_under_subset(spark):
    """A doc's split must not depend on what other docs exist."""
    docs = _docs(spark)
    full = {r["doc_id"]: r["split"]
            for r in assign_split(docs).select("doc_id", "split").collect()}
    sub = {r["doc_id"]: r["split"]
           for r in assign_split(docs.filter(F.col("doc_id") % 3 == 0))
           .select("doc_id", "split").collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_stratified_sample_is_subset_and_per_stratum(spark):
    docs = _docs(spark)
    sampled = stratified_sample(docs, {"src0": 1.0}, default_fraction=0.0)
    got = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    want = {r["doc_id"] for r in docs.filter("source = 'src0'")
            .select("doc_id").collect()}
    assert got == want  # rate 1.0 keeps the whole stratum, 0.0 drops rest


def test_sample_filter_is_map_side(spark):
    """The sampling predicate must be a scan-side filter: zero Exchange in
    the plan — the property that makes it free at 100 TB."""
    sampled = stratified_sample(
        _docs(spark), {"src0": 0.5}, default_fraction=0.1)
    plan = sampled._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "Exchange" not in plan


def test_contamination_broadcasts_benchmark(spark):
    docs = _docs(spark)
    res = ngram_contamination(docs.filter("source <> 'src19'"),
                              docs.filter("source = 'src19'"), n=4)
    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = res.collect()
    # src19's near-dup partners overlap; every count positive
    assert all(r["n_shared"] > 0 for r in rows)


def test_hash_bucket_range(spark):
    docs = _docs(spark)
    mm = docs.select(hash_bucket(F.col("doc_id")).alias("b")) \
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi")).first()
    assert 0 <= mm["lo"] and mm["hi"] < 1_000_000


def test_mixture_plan_math(spark):
    """40/30/20/10 targets over a 10% budget at 500 docs (25/source):
    budget 50 → targets 20/15/10/5 → rates 0.8/0.6/0.4/0.2, others 0."""
    from graph_database_spark.operators.sampling import (
        apply_mixture_plan, mixture_plan,
    )
    docs = _docs(spark)
    plan = mixture_plan(
        docs, {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        sample_frac=0.1)
    rows = {r["source"]: r for r in plan.collect()}
    assert len(rows) == 20 and all(r["n_docs"] == 25 for r in rows.values())
    expect = {"src0": (20, 0.8), "src1": (15, 0.6),
              "src2": (10, 0.4), "src3": (5, 0.2)}
    for src, (target, rate) in expect.items():
        assert rows[src]["target_docs"] == target
        assert rows[src]["rate"] == pytest.approx(rate)
    assert rows["src7"]["target_docs"] == 0 and rows["src7"]["rate"] == 0.0

    # a stratum smaller than its target saturates at rate 1
    sat = mixture_plan(docs, {"src0": 1.0}, sample_frac=0.5)
    r0 = {r["source"]: r["rate"] for r in sat.collect()}["src0"]
    assert r0 == 1.0

    # applying the plan keeps only planned strata, at most target+1 rows
    # each (hash thresholding is statistically, not exactly, proportional)
    sampled = apply_mixture_plan(docs, plan)
    by_src = {r["source"]: r["n"] for r in
              sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert set(by_src) <= set(expect)
    # deterministic: same plan, same rows
    again = apply_mixture_plan(docs, plan)
    assert sorted(r["doc_id"] for r in sampled.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_quality_weighted_sample_properties(spark):
    """Higher quality → higher keep rate; deterministic; subset-stable."""
    from graph_database_spark.operators.sampling import (
        quality_weighted_sample,
    )
    from graph_database_spark.operators.text import quality_col
    scored = _docs(spark).select(
        "doc_id", quality_col(F.col("text")).alias("quality"))
    kept = quality_weighted_sample(scored, base_rate=0.9)
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in
               quality_weighted_sample(scored.repartition(7),
                                       base_rate=0.9).collect())
    assert a == b and 0 < len(a) < scored.count()
    # rate 0 keeps nothing; quality=1 docs under rate 1 all kept
    assert quality_weighted_sample(scored, base_rate=0.0).count() == 0


def test_shard_by_token_budget_packs_uniformly(spark):
    from graph_database_spark.operators.sampling import (
        shard_by_token_budget,
    )
    from graph_database_spark.operators.text import (
        WS_TOKEN_PATTERN, _match_count,
    )
    scored = _docs(spark).select(
        "doc_id", "source",
        _match_count(F.col("text"), WS_TOKEN_PATTERN).alias("ws_tokens"))
    shards = shard_by_token_budget(scored, budget=2000)
    agg = shards.groupBy("source", "shard").agg(
        F.sum("ws_tokens").alias("tok")).collect()
    # every shard except possibly each source's last holds ≥ budget
    # tokens once its first overflowing doc lands, and the exclusive
    # prefix rule keeps every shard under budget + max_doc_tokens
    max_doc = scored.agg(F.max("ws_tokens")).first()[0]
    per_src_last = {r["source"]: max(x["shard"] for x in agg
                                     if x["source"] == r["source"])
                    for r in agg}
    for r in agg:
        assert r["tok"] < 2000 + max_doc
        if r["shard"] != per_src_last[r["source"]]:
            assert r["tok"] + max_doc >= 2000
    # shards are contiguous 0..last per source
    by_src = {}
    for r in agg:
        by_src.setdefault(r["source"], set()).add(r["shard"])
    for shs in by_src.values():
        assert shs == set(range(len(shs)))


def test_pack_sequences_offsets_chain(spark):
    from graph_database_spark.operators.sampling import (
        pack_sequences, shard_by_token_budget)
    docs = spark.createDataFrame(
        [(i, "s0" if i % 2 else "s1", 700 + (i % 5) * 100)
         for i in range(1, 21)],
        ["doc_id", "source", "ws_tokens"])
    packed = pack_sequences(docs, budget=2000).collect()
    # shard assignment agrees with shard_by_token_budget
    shards = {(r["doc_id"]): r["shard"]
              for r in shard_by_token_budget(docs, budget=2000).collect()}
    assert all(r["shard"] == shards[r["doc_id"]] for r in packed)
    # within each (source, shard): seq_pos is 1..n and offsets chain
    groups: dict = {}
    for r in packed:
        groups.setdefault((r["source"], r["shard"]), []).append(r)
    for rows in groups.values():
        rows.sort(key=lambda r: r["seq_pos"])
        assert [r["seq_pos"] for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0]["start_offset"] == 0
        for a, b in zip(rows, rows[1:]):
            assert b["start_offset"] == a["start_offset"] + a["ws_tokens"]


def test_stratified_exact_n_counts_and_determinism(spark):
    from graph_database_spark.operators.sampling import stratified_exact_n
    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = stratified_exact_n(df, 5, strata_col="source").collect()
    by = {}
    for r in got:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by["big"]) == 5          # exactly n
    assert by["tiny"] == {100, 101, 102}  # short stratum keeps all
    # deterministic under repartition
    again = stratified_exact_n(df.repartition(7), 5,
                               strata_col="source").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_weighted_exact_n_counts_and_preference(spark):
    """Exactly n per stratum; a dominant weight is always selected; the
    sample is stable under repartitioning (hash keys, not rand())."""
    from graph_database_spark.operators.sampling import weighted_exact_n

    rows = ([(i, "s1", 0.01) for i in range(50)] + [(999, "s1", 1000.0)]
            + [(1000 + i, "s2", 1.0) for i in range(3)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    out = weighted_exact_n(df, 5, weight_col="w", strata_col="source")
    got = {r["source"]: set() for r in out.collect()}
    for r in out.collect():
        got[r["source"]].add(r["doc_id"])
    assert len(got["s1"]) == 5
    assert 999 in got["s1"]  # 10^5× the weight ⇒ sampled w.p. ~1
    assert got["s2"] == {1000, 1001, 1002}  # stratum smaller than n
    again = {(r["source"], r["doc_id"])
             for r in weighted_exact_n(df.repartition(13), 5,
                                       weight_col="w",
                                       strata_col="source").collect()}
    assert again == {(s, d) for s, ds in got.items() for d in ds}


def test_temperature_mixture_upweights_small_domains(spark):
    """α=0.5 smoothing: a domain with 1/100 the token mass gets far MORE
    than 1/100 of the budget (√ ratio = 1/10), and rates cap at 1.0;
    alpha != 0.5 is rejected (pow() is not cross-engine exact)."""
    import pytest

    from graph_database_spark.operators.sampling import (
        temperature_mixture_plan,
    )
    rows = ([("big", 100) for _ in range(1000)]
            + [("small", 100) for _ in range(10)])
    df = spark.createDataFrame(rows, "source string, ws_tokens int")
    plan = {r["source"]: r for r in
            temperature_mixture_plan(df, sample_frac=0.5).collect()}
    assert plan["big"]["token_mass"] == 100_000
    assert plan["small"]["token_mass"] == 1_000
    # proportional share would be ~1/101; sqrt smoothing gives ~1/11
    assert plan["small"]["weight"] > 5 * (1 / 101)
    assert abs(plan["small"]["weight"]
               - (1000 ** 0.5) / (1000 ** 0.5 + 100_000 ** 0.5)) < 1e-5
    # small domain's target exceeds its mass -> rate saturates at 1.0
    assert plan["small"]["target_tokens"] > 1_000
    assert plan["small"]["rate"] == 1.0
    assert 0 < plan["big"]["rate"] < 1
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, alpha=0.7)


def test_temperature_mixture_zero_mass_stratum_rate_zero(spark):
    """A stratum whose rows carry zero tokens has a 0-token budget:
    rate must be 0.0, not the 1.0 least() would give by skipping the
    NULL 0/0 division."""
    from graph_database_spark.operators.sampling import (
        temperature_mixture_plan,
    )
    rows = [("full", 100)] * 50 + [("empty", 0)] * 5
    df = spark.createDataFrame(rows, "source string, ws_tokens int")
    plan = {r["source"]: r for r in
            temperature_mixture_plan(df, sample_frac=0.5).collect()}
    assert plan["empty"]["token_mass"] == 0
    assert plan["empty"]["rate"] == 0.0
    assert plan["full"]["rate"] > 0


def test_bloom_contamination_superset_and_bounded_fp(spark):
    """Bloom decontamination can never miss a contaminated doc (no
    false negatives: flagged ⊇ exact, n_flagged ≥ n_shared per doc) and
    at 30+ bits/key the false-positive surplus stays tiny. The probe
    side must stay a broadcast join — the corpus never shuffles before
    the per-doc count."""
    from graph_database_spark.operators.sampling import bloom_contamination

    docs = _docs(spark)
    train = docs.filter("source <> 'src19'")
    bench = docs.filter("source = 'src19'")
    exact = {r["doc_id"]: r["n_shared"]
             for r in ngram_contamination(train, bench, n=4).collect()}
    res = bloom_contamination(train, bench, n=4)
    flagged = {r["doc_id"]: r["n_flagged"] for r in res.collect()}
    assert set(flagged) >= set(exact) and exact
    for d, n_shared in exact.items():
        assert flagged[d] >= n_shared, d
    # FP surplus: spurious docs ≤ 2% of the clean corpus at this scale
    clean = train.count() - len(exact)
    assert len(flagged) - len(exact) <= max(1, clean * 0.02)

    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_negative_samples_deterministic_and_positive_free(spark):
    """k hash-drawn negatives per user: never a user's own positive,
    at most k per user (collision draws DROPPED, not re-drawn), items
    from the catalog only, and bit-identical across calls and
    partitionings (the reproducibility contract rand() can't give)."""
    from graph_database_spark.operators.sampling import negative_samples

    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)],
        ["customer_id", "product_id"])
    cat = spark.createDataFrame([(i,) for i in range(10, 20)],
                                ["product_id"])
    out = negative_samples(pos, cat, k=4).collect()
    by_user: dict[int, list] = {}
    positives = {(1, 10), (1, 11), (2, 10), (3, 12)}
    for r in out:
        assert (r["customer_id"], r["product_id"]) not in positives
        assert 10 <= r["product_id"] < 20
        by_user.setdefault(r["customer_id"], []).append(r["product_id"])
    assert set(by_user) <= {1, 2, 3}
    assert all(len(v) <= 4 for v in by_user.values())
    assert sum(len(v) for v in by_user.values()) >= 8  # mostly kept
    again = negative_samples(pos.repartition(7), cat.repartition(3),
                             k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_fact_sized_catalog_fails_loudly(spark, monkeypatch):
    """The catalog is a dimension by contract — its dense-rank window is
    a single-task sort and the ranked frame is broadcast. A fact-sized
    catalog must raise at call time (measured-count gate), not hang one
    task. Gate lowered via monkeypatch so the test stays tiny."""
    from graph_database_spark.operators import sampling

    pos = spark.createDataFrame([(1, 10)], ["customer_id", "product_id"])
    cat = spark.createDataFrame([(i,) for i in range(10, 20)],
                                ["product_id"])
    monkeypatch.setattr(sampling, "_CATALOG_MAX_ROWS", 5)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="dimension table"):
        sampling.negative_samples(pos, cat, k=2)


def test_hll_pairwise_overlap_bounds_and_exact_agreement(spark):
    """Sketch-level union/intersection sanity on real per-source
    vocabularies: est_union within [max(est_a, est_b), est_a + est_b],
    jaccard in [0, 1], and the inclusion-exclusion overlap tracks the
    EXACT pairwise intersection within the ~3σ HLL envelope on a
    spot-checked pair."""
    from graph_database_spark.operators.sketches import (
        hll_pairwise_overlap, hll_sketch,
    )
    from graph_database_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = (docs.select(
                "source",
                F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                  r"\s+")).alias("token"))
            .filter(F.col("token") != "").localCheckpoint())
    out = hll_pairwise_overlap(
        hll_sketch(toks, group_cols=("source",)), "source").collect()
    n_sources = toks.select("source").distinct().count()
    assert len(out) == n_sources * (n_sources - 1) // 2
    for r in out:
        assert max(r["est_a"], r["est_b"]) <= r["est_union"] * (1 + 1e-9)
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-9
        assert 0.0 <= r["jaccard"] <= 1.0
    # spot-check one pair against the exact intersection (m=256 → σ≈6.5%
    # per estimate; inclusion-exclusion compounds to ~3 estimates)
    r = next(x for x in out if x["a"] == "src0" and x["b"] == "src1")
    exact = (toks.filter("source = 'src0'").select("token").distinct()
             .intersect(toks.filter("source = 'src1'")
                        .select("token").distinct()).count())
    assert abs(r["est_overlap"] - exact) <= 3 * 0.065 * 3 * exact, (
        r["est_overlap"], exact)


def test_bloom_pruned_contamination_is_exact(spark):
    """The Bloom-pruned path returns EXACTLY ngram_contamination's
    answer (Bloom has no false negatives, so the exact verify sees
    every true hit; its inner join then discards every Bloom false
    positive) — the property that lets the streaming ingest pipeline
    ride the fixed-size bitmap broadcast per trigger without changing
    the accepted set. Checked with and without a precomputed bitmap,
    and through curate_documents' benchmark_bloom switch."""
    from graph_database_spark.operators.sampling import (
        benchmark_shingle_bloom, bloom_pruned_contamination,
    )
    from graph_database_spark.operators.text import curate_documents

    docs = _docs(spark)
    train = docs.filter("source <> 'src19'")
    bench = docs.filter("source = 'src19'")
    exact = {(r["doc_id"], r["n_shared"])
             for r in ngram_contamination(train, bench, n=4).collect()}
    assert exact
    got = {(r["doc_id"], r["n_shared"])
           for r in bloom_pruned_contamination(train, bench, n=4)
           .collect()}
    assert got == exact
    bloom = benchmark_shingle_bloom(bench, n=4).localCheckpoint()
    got_pre = {(r["doc_id"], r["n_shared"])
               for r in bloom_pruned_contamination(
                   train, bench, n=4, bloom=bloom).collect()}
    assert got_pre == exact
    plain = {r["doc_id"] for r in
             curate_documents(train, bench).collect()}
    bloomed = {r["doc_id"] for r in
               curate_documents(train, bench,
                                benchmark_bloom=bloom).collect()}
    assert plain == bloomed and plain


def test_bloom_artifact_rejects_mismatched_probe(spark):
    """Probing a Bloom artifact with different parameters than its
    build silently voids the no-false-negative guarantee — the artifact
    carries (shingle_n, num_bits, k) as schema metadata (surviving a
    localCheckpoint, the streaming pipeline's storage form) and a
    mismatched probe raises instead of missing contamination."""
    import pytest

    from graph_database_spark.operators.sampling import (
        benchmark_shingle_bloom, bloom_pruned_contamination,
    )
    from graph_database_spark.operators.sketches import bloom_may_contain

    docs = _docs(spark)
    train = docs.filter("source <> 'src19'")
    bench = docs.filter("source = 'src19'")
    bloom = benchmark_shingle_bloom(bench, n=4).localCheckpoint()
    # the exact default-collision trap the r9 advice named: n=5 probe
    # (bloom_pruned_contamination's default) against the n=4 artifact
    with pytest.raises(ValueError, match="bloom_shingle_n"):
        bloom_pruned_contamination(train, bench, bloom=bloom).collect()
    with pytest.raises(ValueError, match="bloom_num_bits"):
        bloom_may_contain(train.select(F.col("text").alias("shingle")),
                          bloom, "shingle", num_bits=1 << 20)
    with pytest.raises(ValueError, match="bloom_k"):
        bloom_may_contain(train.select(F.col("text").alias("shingle")),
                          bloom, "shingle", k=3)
    # matching parameters pass through the guard untouched
    assert bloom_pruned_contamination(
        train, bench, n=4, bloom=bloom).count() > 0
