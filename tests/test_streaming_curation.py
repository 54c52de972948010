"""Streaming curation gate: the row-local metric expressions run
unchanged on a stream; the memory-sink result must equal the batch twin
exactly, and a PII-bearing doc must be rejected in-flight."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.curation import (
    annotate_stream, curation_filter_stream,
)
from graph_database_spark.streaming.dedup import read_document_stream

SF_DIR = "/root/testdata/sf0.001"


def _drain(stream_df, name):
    q = (stream_df.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
        return q
    finally:
        q.stop()


def test_curation_stream_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(d)

    stream = read_document_stream(spark, d, glob="*.parquet")
    _drain(curation_filter_stream(stream), "curated_stream")
    got = {(r["doc_id"], r["quality"], r["ws_tokens"])
           for r in spark.sql("SELECT * FROM curated_stream").collect()}

    want = {(r["doc_id"], r["quality"], r["ws_tokens"])
            for r in curation_filter_stream(docs).collect()}
    assert got == want
    assert got, "gate should pass a non-empty subset of the corpus"
    # and it is a strict gate, not a pass-through
    assert len(got) < docs.count()


def test_curation_stream_is_stateless(spark, tmp_path):
    """The gate must need no state store: a plan with no aggregation or
    dedup means per-row processing with zero memory growth on an
    unbounded feed."""
    docs = load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(d)
    stream = curation_filter_stream(
        read_document_stream(spark, d, glob="*.parquet"))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    for stateful in ("Aggregate", "Deduplicate", "FlatMapGroupsWithState"):
        assert stateful not in plan


def test_pii_rejected_in_flight(spark, tmp_path):
    base = ("the and of to in is that it was for " * 12).strip()
    rows = [(1, base, "en", "s0", len(base)),
            (2, base + " contact bob@example.com", "en", "s0", 24)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)

    stream = read_document_stream(spark, d, glob="*.parquet")
    _drain(curation_filter_stream(stream), "pii_gate")
    kept = {r["doc_id"] for r in spark.sql(
        "SELECT doc_id FROM pii_gate").collect()}
    assert kept == {1}

    ann = {r["doc_id"]: r for r in annotate_stream(df).collect()}
    assert ann[2]["n_email"] == 1 and ann[1]["n_email"] == 0


def test_ingest_pipeline_stream_equals_one_shot(spark, tmp_path):
    """The full ingest chain (curate -> exact -> MinHash -> SemDeDup,
    all vs the standing corpus) unions over micro-batches to exactly
    the one-shot answer: every stage is a per-document decision against
    static corpus state, so trigger boundaries cannot change outcomes."""
    from pyspark.sql import functions as F

    from graph_database_spark.operators.ann import semantic_cell_index
    from graph_database_spark.sources.testdata import load_table
    from graph_database_spark.streaming.pipeline import (
        curate_dedup_ingest_stream, ingest_accept_batch,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    benchmark = docs.filter(F.col("source") == "src19")
    new = docs.filter((F.col("doc_id") % 3 == 0)
                      & (F.col("source") != "src19"))
    corpus = docs.filter((F.col("doc_id") % 3 != 0)
                         & (F.col("source") != "src19"))
    emb = load_table(spark, sf, "embeddings")
    cents = [list(r[0]) for r in
             emb.filter(F.col("vec_id") < 16).orderBy("vec_id")
                .select("embedding").collect()]
    corpus_index = semantic_cell_index(
        emb.join(corpus.select(F.col("doc_id").alias("vec_id")),
                 "vec_id", "left_semi"), cents).localCheckpoint()

    feed = str(tmp_path / "feed")
    new.repartition(3).write.parquet(feed)  # 3 micro-batches
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))

    got: dict[int, tuple] = {}

    def sink(df, batch_id):
        for r in df.collect():
            assert r["doc_id"] not in got
            got[r["doc_id"]] = (r["quality"], r["ws_tokens"])

    q = curate_dedup_ingest_stream(stream, benchmark, corpus,
                                   corpus_index, cents, emb, sink,
                                   semantic_threshold=0.45)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {r["doc_id"]: (r["quality"], r["ws_tokens"])
            for r in ingest_accept_batch(new, benchmark, corpus,
                                         corpus_index, cents, emb,
                                         semantic_threshold=0.45).collect()}
    assert got == want
    # non-vacuous: the gate accepted some docs AND rejected some
    assert 0 < len(got) < new.count()


def test_ingest_check_ids_flag_and_stored_index(spark):
    """check_ids=True rejects colliding doc_ids loudly; check_ids=False
    skips the per-trigger collision job (upstream guarantees fresh ids).
    Passing the precomputed MinHash bucket index — the per-trigger
    production shape — must not change the accepted set."""
    import pytest

    from graph_database_spark.operators.ann import semantic_cell_index
    from graph_database_spark.operators.dedup import minhash_bucket_index
    from graph_database_spark.streaming.pipeline import (
        corpus_hash_set, ingest_accept_batch,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    benchmark = docs.filter(F.col("source") == "src19")
    new = docs.filter((F.col("doc_id") % 3 == 0)
                      & (F.col("source") != "src19"))
    corpus = docs.filter((F.col("doc_id") % 3 != 0)
                         & (F.col("source") != "src19"))
    emb = load_table(spark, sf, "embeddings")
    cents = [list(r[0]) for r in
             emb.filter(F.col("vec_id") < 16).orderBy("vec_id")
                .select("embedding").collect()]
    corpus_index = semantic_cell_index(
        emb.join(corpus.select(F.col("doc_id").alias("vec_id")),
                 "vec_id", "left_semi"), cents).localCheckpoint()

    with pytest.raises(ValueError, match="collide"):
        ingest_accept_batch(corpus.limit(5), benchmark, corpus,
                            corpus_index, cents, emb)

    base = {r["doc_id"] for r in
            ingest_accept_batch(new, benchmark, corpus, corpus_index,
                                cents, emb,
                                semantic_threshold=0.45).collect()}
    mh_idx = minhash_bucket_index(corpus).localCheckpoint()
    hashes = corpus_hash_set(corpus).localCheckpoint()
    fast = {r["doc_id"] for r in
            ingest_accept_batch(new, benchmark, corpus, corpus_index,
                                cents, emb, semantic_threshold=0.45,
                                corpus_hashes=hashes,
                                corpus_minhash_index=mh_idx,
                                check_ids=False).collect()}
    assert fast == base and base
