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
