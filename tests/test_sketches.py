"""Misra-Gries heavy hitters: exactness under forced evictions and the
per-partition memory bound the sketch exists to provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import (
    _mg_summaries, corpus_tokens, heavy_hitters,
)
from graph_database_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _exact(tokens, min_frac):
    n = tokens.count()
    import math
    thr = math.ceil(min_frac * n)
    return {(r["token"], r["n_occurrences"])
            for r in tokens.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") >= thr).collect()}


def test_heavy_hitters_exact_with_forced_evictions(spark):
    toks = corpus_tokens(load_table(spark, SF_DIR, "documents"))
    # vocabulary >> k=8 counters: every batch evicts, the sketch alone is
    # badly lossy — the recount phase must still restore exact output
    got = {(r["token"], r["n_occurrences"])
           for r in heavy_hitters(toks, min_frac=0.02, k=8).collect()}
    assert got == _exact(toks, 0.02)
    assert got  # non-trivial: the corpus does have >=2% tokens


def test_heavy_hitters_exact_default_budget(spark):
    toks = corpus_tokens(load_table(spark, SF_DIR, "documents"))
    got = {(r["token"], r["n_occurrences"])
           for r in heavy_hitters(toks, min_frac=0.05).collect()}
    assert got == _exact(toks, 0.05)


def test_mg_summaries_respect_counter_budget(spark):
    toks = corpus_tokens(load_table(spark, SF_DIR, "documents"))
    k = 8
    rows = _mg_summaries(toks, k).collect()
    per_part_tokens = [r for r in rows if r["token"] is not None]
    markers = [r for r in rows if r["token"] is None]
    # one marker per partition carrying that partition's token total
    assert sum(m["part_total"] for m in markers) == toks.count()
    # every partition's surviving counter set is within budget
    assert len(per_part_tokens) <= k * len(markers)


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """The count-min guarantees, asserted over the FULL vocabulary at
    sf0.01: est >= true for every token (deterministic), and the
    overcount stays within the e/width * N analysis bound — per token
    with probability 1 - e^(-depth) ~ 0.98, so the tail is checked at
    the 98th percentile and the mean far below the bound."""
    import math

    from graph_database_spark.operators.sketches import (
        cms_estimate, count_min_sketch,
    )

    depth, width = 4, 256
    # vocabulary (10k) >> width (256) forces heavy slot collisions — the
    # regime the bound is about; the test corpus's ~31-token vocabulary
    # would never collide at any realistic width
    n_total = 100_000
    toks = (spark.range(n_total)
            .select(F.concat(F.lit("tok"),
                             (F.col("id") % 10_000).cast("string"))
                    .alias("token"))
            .localCheckpoint())
    sketch = count_min_sketch(toks, depth=depth, width=width)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms_estimate(sketch, exact.select("token"), depth=depth,
                       width=width)
    rows = exact.join(est, "token").collect()
    assert len(rows) == 10_000
    overcounts = sorted(r["n_cms"] - r["n_true"] for r in rows)
    assert overcounts[0] >= 0, "CMS must never undercount"
    eps_n = math.e / width * n_total
    p98 = overcounts[int(0.98 * (len(overcounts) - 1))]
    assert p98 <= eps_n, f"98th-pct overcount {p98} > eN bound {eps_n:.1f}"
    mean = sum(overcounts) / len(overcounts)
    assert mean <= depth * n_total / width, (
        f"mean overcount {mean:.1f} above the depth*N/width expectation")
    # and on the real corpus the estimates must remain upper bounds
    ctoks = corpus_tokens(
        load_table(spark, "/root/testdata/sf0.01", "documents"))
    ctoks = ctoks.localCheckpoint()
    csk = count_min_sketch(ctoks, depth=4, width=2048)
    cex = ctoks.groupBy("token").agg(F.count(F.lit(1)).alias("n_true"))
    crows = (cex.join(cms_estimate(csk, cex.select("token"),
                                   depth=4, width=2048), "token")
             .collect())
    assert all(r["n_cms"] >= r["n_true"] for r in crows)


def test_hdr_quantiles_error_bound_and_merge(spark):
    """HDR estimates are deterministic lower bounds within 2^-4 = 6.25%
    relative error of the exact same-rank percentile, and sketches
    built on disjoint halves merge by addition into the one-shot
    sketch (mergeability — the 100 TB shard-then-merge path)."""
    import math

    from graph_database_spark.operators.sketches import (
        hdr_quantiles, hdr_sketch,
    )

    e = (load_table(spark, "/root/testdata/sf0.01", "events")
         .select("event_type",
                 F.floor(F.col("value") * 100).cast("long").alias("cents")))
    sk = hdr_sketch(e, "cents", group_cols=("event_type",))
    got = {r["event_type"]: r
           for r in hdr_quantiles(sk, (0.5, 0.9, 0.99),
                                  group_cols=("event_type",)).collect()}

    exact = {}
    for r in e.collect():
        exact.setdefault(r["event_type"], []).append(r["cents"])
    for t, vals in exact.items():
        vals.sort()
        n = len(vals)
        assert got[t]["n"] == n
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            true = vals[math.ceil(q * n) - 1]  # same rank convention
            est = got[t][col]
            assert est <= true, (t, col, est, true)
            assert true < est * (1 + 2 ** -4) + 1, (t, col, est, true)

    # mergeability: half-sketches sum into the one-shot sketch
    h1 = hdr_sketch(e.filter(F.col("cents") % 2 == 0), "cents",
                    group_cols=("event_type",))
    h2 = hdr_sketch(e.filter(F.col("cents") % 2 == 1), "cents",
                    group_cols=("event_type",))
    merged = {(r["event_type"], r["bucket"]): r["mn"]
              for r in h1.unionByName(h2)
              .groupBy("event_type", "bucket")
              .agg(F.sum("n").alias("mn")).collect()}
    one = {(r["event_type"], r["bucket"]): r["n"] for r in sk.collect()}
    assert merged == one

    # bucket-count bound: the state that makes it a sketch
    assert sk.count() <= 5 * (64 - 4) * 16


def test_hdr_bucket_rejects_nothing_but_bounds_hold(spark):
    """Bucket lower bounds are exact for small values (bit_length <= 5)
    and within 1/16 below the value for large ones."""
    from graph_database_spark.operators.sketches import hdr_bucket_expr

    df = spark.range(0, 4096).select(F.col("id").alias("c"))
    rows = df.select("c", hdr_bucket_expr("c").alias("b")).collect()
    for r in rows:
        c, b = r["c"], r["b"]
        assert b <= c
        if c < 32:
            assert b == c, (c, b)
        else:
            assert c < b * (1 + 2 ** -4), (c, b)


def test_hdr_bucket_rejects_negative_values(spark):
    """Negative inputs must fail loudly: bin() of a negative is its
    64-bit two's complement, which would silently collapse every
    negative value into one -2^59 bucket."""
    import pytest

    from graph_database_spark.operators.sketches import hdr_bucket_expr

    df = spark.range(1).select(F.lit(-7).cast("long").alias("c"))
    with pytest.raises(Exception, match="negative value"):
        df.select(hdr_bucket_expr("c")).collect()


def test_bloom_probe_is_map_side_and_keeps_duplicates(spark):
    """bloom_may_contain must not shuffle probe rows (k broadcast word
    lookups, no Exchange on the probe side) and must preserve duplicate
    probe rows verbatim — it is a filter, not a distinct."""
    from graph_database_spark.operators.sketches import (
        bloom_build, bloom_may_contain,
    )

    keys = spark.createDataFrame([("alpha",), ("beta",)], ["k"])
    bloom = bloom_build(keys, "k")
    probes = spark.createDataFrame(
        [("alpha",), ("alpha",), ("gamma",)], ["k"])
    got = [r["k"] for r in bloom_may_contain(probes, bloom, "k").collect()]
    assert sorted(got) == ["alpha", "alpha"]  # dup kept, gamma dropped

    plan = bloom_may_contain(probes, bloom, "k") \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    # broadcast lookups only — zero probe-row shuffles
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan
