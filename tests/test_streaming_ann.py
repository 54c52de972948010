"""Streaming LSH signature ingest vs the batch index build: identical
tables — new vectors become searchable without recomputing the index."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.ann import lsh_signatures
from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.ann import (
    run_signature_ingest, streaming_lsh_signatures,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_signatures_equal_batch(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    feed = str(tmp_path / "feed")
    emb.repartition(4).write.parquet(feed)  # 4 micro-batches

    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(feed))
    out = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")
    q = run_signature_ingest(
        streaming_lsh_signatures(stream, bits=4, tables=12), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["id"], r["table"], r["bucket"])
                for r in spark.read.parquet(out).collect()}
    batch = {(r["id"], r["table"], r["bucket"])
             for r in lsh_signatures(emb, bits=4, tables=12).collect()}
    assert streamed == batch
    n_vec = emb.count()
    assert len(streamed) == n_vec * 12  # one bucket per vector per table
