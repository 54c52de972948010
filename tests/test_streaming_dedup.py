"""Streaming dedup: exact ingest dedup with bounded state, and the
incremental micro-batch-vs-corpus MinHash pipeline, each checked against
its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.dedup import (
    exact_duplicate_groups, minhash_lsh_pairs_between,
)
from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.dedup import (
    exact_dedup_stream, incremental_minhash_stream, read_document_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_exact_dedup_stream_first_occurrence_wins(spark, tmp_path):
    # synthesize a feed with exact duplicates (the sf tables have none)
    rows = [(1, "alpha beta gamma", "en", "s0", 16),
            (2, "alpha beta gamma", "en", "s1", 16),
            (3, "delta epsilon", "en", "s0", 13),
            (4, "delta epsilon", "en", "s1", 13),
            (5, "unique text here", "en", "s0", 16)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)

    stream = read_document_stream(spark, d, glob="*.parquet")
    deduped = exact_dedup_stream(stream)
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName("dedup_stream").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT doc_id, text_hash FROM dedup_stream").collect()
    finally:
        q.stop()

    # one survivor per distinct text: 3 of 5 rows
    assert len(got) == 3
    assert len({r["text_hash"] for r in got}) == 3
    # batch twin agrees on which texts were duplicated
    dup_groups = exact_duplicate_groups(df).collect()
    assert {r["n_docs"] for r in dup_groups} == {2}
    assert len(dup_groups) == 2


def test_incremental_minhash_stream_matches_batch(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    batch_side = docs.filter(F.col("source") == "src0")

    expected = {
        (r["src"], r["dst"], r["jaccard"])
        for r in minhash_lsh_pairs_between(batch_side, corpus).collect()
    }

    collected = []
    stream = (read_document_stream(spark, SF_DIR)
              .filter(F.col("source") == "src0"))
    q = incremental_minhash_stream(
        stream, corpus,
        sink=lambda pairs, _bid: collected.extend(pairs.collect()))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r["src"], r["dst"], r["jaccard"]) for r in collected}
    assert got == expected
    assert len(got) > 0
