"""Streaming count-min sketch vs its batch twin: identical sketches over
the same data — the operational meaning of 'mergeable'."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import (
    cms_estimate, corpus_tokens, count_min_sketch,
)
from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.sketches import (
    read_current_sketch, run_streaming_cms, streaming_cms,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_cms_equals_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    feed = str(tmp_path / "feed")
    # several files => several micro-batch merges into the same state
    docs.repartition(4).write.parquet(feed)

    stream_docs = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(feed))
    toks = (stream_docs
            .select(F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                .alias("token"))
            .filter(F.col("token") != ""))
    out = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_cms(streaming_cms(toks, depth=4, width=512),
                          out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["depth"], r["slot"]): r["n"]
                for r in read_current_sketch(spark, out).collect()}
    batch = {(r["depth"], r["slot"]): r["n"]
             for r in count_min_sketch(corpus_tokens(docs),
                                       depth=4, width=512).collect()}
    assert streamed == batch

    # and the maintained sketch answers probes identically
    probes = spark.createDataFrame([("the",), ("and",)], ["token"])
    got = {r["token"]: r["n_cms"]
           for r in cms_estimate(read_current_sketch(spark, out), probes,
                                 depth=4, width=512).collect()}
    want = {r["token"]: r["n_cms"]
            for r in cms_estimate(
                count_min_sketch(corpus_tokens(docs), depth=4, width=512),
                probes, depth=4, width=512).collect()}
    assert got == want


def test_streaming_corpus_stats_equals_batch(spark, tmp_path):
    """BM25/TF-IDF corpus stats maintained over a document stream must
    be BIT-IDENTICAL to the batch operator on the same corpus (VERDICT
    r5 #8) — df/tf/doc counts merge by addition because per-doc df
    dedup happens row-locally, never in aggregation state."""
    import math

    from graph_database_spark.operators.text import corpus_stats_rows
    from graph_database_spark.streaming.text_stats import (
        read_current_stats, run_streaming_corpus_stats,
        streaming_corpus_stats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    feed = str(tmp_path / "feed")
    docs.repartition(5).write.parquet(feed)  # several micro-batch merges

    stream_docs = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(feed))
    out = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_corpus_stats(
        streaming_corpus_stats(stream_docs), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["key"], r["kind"]): r["n"]
                for r in read_current_stats(spark, out).collect()}
    batch = {(r["key"], r["kind"]): r["n"]
             for r in corpus_stats_rows(docs).collect()}
    assert streamed == batch and streamed

    # the maintained table answers the BM25 idf question identically to
    # the batch path: idf(t) = ln(2N+2) - ln(2df+1)
    n_docs = streamed[("", "doc")]
    assert n_docs == docs.count()
    some_token = next(k for (k, kind) in streamed if kind == "df")
    df_t = streamed[(some_token, "df")]
    idf_stream = math.log(2 * n_docs + 2) - math.log(2 * df_t + 1)
    df_b = batch[(some_token, "df")]
    assert idf_stream == math.log(2 * n_docs + 2) - math.log(2 * df_b + 1)
    # total_tokens / avgdl derive from the same table
    total = sum(n for (k, kind), n in streamed.items() if kind == "tf")
    assert total == sum(n for (k, kind), n in batch.items() if kind == "tf")


def test_streaming_hll_equals_batch(spark, tmp_path):
    """The HLL register table maintained over a document stream must be
    BIT-IDENTICAL to the batch sketch on the same corpus — max-merge
    across micro-batches is the sketch's mergeability property."""
    from graph_database_spark.operators.sketches import (
        corpus_tokens, hll_estimate, hll_sketch,
    )
    from graph_database_spark.streaming.sketches import (
        run_streaming_cms, streaming_hll,
    )

    docs = load_table(spark, SF_DIR, "documents")
    feed = str(tmp_path / "feed")
    docs.repartition(4).write.parquet(feed)

    stream_docs = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(feed))
    toks = (stream_docs
            .select(F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                .alias("token"))
            .filter(F.col("token") != ""))
    out = str(tmp_path / "hll")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_cms(streaming_hll(toks), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {r["register"]: r["max_rank"]
                for r in read_current_sketch(spark, out).collect()}
    batch_sketch = hll_sketch(corpus_tokens(docs))
    batch = {r["register"]: r["max_rank"] for r in batch_sketch.collect()}
    assert streamed == batch and streamed

    # and the estimate derived from the streamed registers lands within
    # the standard-error band of the exact distinct count
    est = hll_estimate(batch_sketch).collect()[0]["hll_estimate"]
    exact = corpus_tokens(docs).distinct().count()
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_hll_error_bound_across_cardinalities(spark):
    """HLL with m=256 registers has σ ≈ 1.04/√256 = 6.5%; the estimate
    must land within ~3σ of the exact cardinality from the linear-
    counting regime through the raw-estimator regime."""
    from graph_database_spark.operators.sketches import (
        hll_estimate, hll_sketch,
    )

    for n in (50, 500, 5000, 50000):
        toks = spark.range(n).selectExpr("concat('tok-', id) AS token")
        est = hll_estimate(hll_sketch(toks)).collect()[0]["hll_estimate"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_streaming_hdr_equals_batch(spark, tmp_path):
    """The HDR bucket table maintained over an event stream must be
    BIT-IDENTICAL to the batch sketch on the same rows — count-merge
    across micro-batches is the histogram's mergeability property."""
    from graph_database_spark.operators.sketches import hdr_sketch
    from graph_database_spark.streaming.sketches import (
        run_streaming_cms, streaming_hdr,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    feed = str(tmp_path / "feed")
    events.repartition(4).write.parquet(feed)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    out = str(tmp_path / "hdr")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_cms(
        streaming_hdr(stream, "cents", group_cols=("event_type",)),
        out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["event_type"], r["bucket"]): r["n"]
                for r in read_current_sketch(spark, out).collect()}
    batch = {(r["event_type"], r["bucket"]): r["n"]
             for r in hdr_sketch(events, "cents",
                                 group_cols=("event_type",)).collect()}
    assert streamed == batch and streamed


def test_streaming_bloom_equals_batch(spark, tmp_path):
    """The Bloom bitmap maintained over a shingle stream must be
    BIT-IDENTICAL to the batch build on the same keys — bit_or merge
    across micro-batches is set-union mergeability."""
    from graph_database_spark.operators.dedup import word_shingles
    from graph_database_spark.operators.sketches import bloom_build
    from graph_database_spark.streaming.sketches import (
        run_streaming_cms, streaming_bloom,
    )

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("source") == "src19")
    feed = str(tmp_path / "feed")
    bench.repartition(3).write.parquet(feed)

    shingles = lambda df: df.select(
        F.explode(word_shingles(F.col("text"), 4)).alias("shingle"))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    out = str(tmp_path / "bloom")
    q = run_streaming_cms(streaming_bloom(shingles(stream), "shingle"),
                          out, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {r["word"]: r["bits"]
                for r in read_current_sketch(spark, out).collect()}
    batch = {r["word"]: r["bits"]
             for r in bloom_build(shingles(bench).distinct(),
                                  "shingle").collect()}
    assert streamed == batch and streamed
