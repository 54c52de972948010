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
