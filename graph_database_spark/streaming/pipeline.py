"""Streaming ingest twin of the curation pipeline: per micro-batch,
curate → exact-dedup vs corpus → MinHash-LSH vs corpus → SemDeDup vs
corpus, against a STANDING corpus's precomputed artifacts (hash set,
signature source, cell index).

Batching-invariance by construction: every stage is a PER-DOCUMENT
decision against static corpus state — the corpus always wins, and no
stage compares two in-flight documents — so the union of per-batch
outputs equals the one-shot answer on the same rows regardless of
trigger boundaries (asserted in tests/test_streaming_curation.py).
Intra-ingest duplicates (two near-identical docs arriving in the same
ingest window) are deliberately NOT resolved here: they fall to the
next corpus-refresh cycle, the standard lambda split — resolving them
in-flight would make results depend on micro-batch boundaries.

At 100 TB/day the corpus artifacts are tables maintained by the batch
tier: md5-hash set (exact), MinHash bucket index (signatures are
append-only), SemDeDup cell index (`ann.semantic_cell_index`). Per
trigger, batch size — never corpus size — bounds every quadratic stage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def corpus_hash_set(corpus_docs: DataFrame,
                    text_col: str = "text") -> DataFrame:
    """(__h): the standing corpus's distinct md5 text-hash set — the
    exact-dedup artifact the batch tier maintains. Precompute (and
    checkpoint/persist) ONCE per corpus refresh; recomputing it per
    trigger would re-hash the whole corpus every micro-batch."""
    return corpus_docs.select(
        F.md5(F.col(text_col)).alias("__h")).distinct()


def ingest_accept_batch(batch_docs: DataFrame, benchmark: DataFrame,
                        corpus_docs: DataFrame, corpus_index: DataFrame,
                        centroids: list[list[float]],
                        embeddings_lookup: DataFrame,
                        semantic_threshold: float = 0.95,
                        text_col: str = "text",
                        corpus_hashes: DataFrame | None = None,
                        corpus_minhash_index: DataFrame | None = None,
                        check_ids: bool = True,
                        benchmark_bloom: DataFrame | None = None
                        ) -> DataFrame:
    """(doc_id, quality, ws_tokens): the accepted rows of ONE batch of
    new documents vs the standing corpus; the exact function the
    streaming wrapper runs per trigger, exposed so the one-shot
    equivalence is the SAME code path, not a twin.

    PRECONDITION (checked loudly when `check_ids`): batch doc_ids must be
    disjoint from corpus doc_ids — a colliding id would fetch the CORPUS
    doc's embedding for the semantic decision and merge both texts into
    one MinHash signature. The check is a corpus-keyed semi-join — a full
    Spark job — so ingests whose upstream already guarantees fresh ids
    (monotonic sequence, UUID) should pass check_ids=False per trigger.

    `embeddings_lookup` stands in for the embedding service a real
    ingest calls between dedup and SemDeDup (here: a static
    (vec_id, embedding) frame keyed by doc_id). `corpus_hashes` /
    `corpus_minhash_index` / `benchmark_bloom` are the precomputed
    `corpus_hash_set`, `dedup.minhash_bucket_index`, and
    `sampling.benchmark_shingle_bloom` artifacts (derived on the fly
    when absent — fine one-shot, wasteful per-trigger: without the
    minhash index the WHOLE corpus is re-shingled and re-signed every
    micro-batch). The bloom changes the curation PLAN, not its answer
    (Bloom-pruned candidates are exactly verified), so passing it per
    trigger preserves batch≡stream equivalence verbatim."""
    from ..operators.dedup import (minhash_bucket_index,
                                   minhash_lsh_pairs_vs_index)
    from ..operators.ann import semantic_dedup_between
    from ..operators.text import curate_documents

    if check_ids:
        collision = (batch_docs.select("doc_id")
                     .join(corpus_docs.select("doc_id"), "doc_id",
                           "left_semi")
                     .limit(1).count())
        if collision:
            raise ValueError(
                "batch doc_ids collide with corpus doc_ids — the id space "
                "must be disjoint (embedding lookup and MinHash signatures "
                "key on doc_id)")
    curated = curate_documents(batch_docs, benchmark, text_col=text_col,
                               keep_cols=(text_col,),
                               benchmark_bloom=benchmark_bloom)
    # exact dedup vs corpus: per-doc hash membership (no within-batch
    # min-id pick — see module docstring on intra-ingest duplicates)
    if corpus_hashes is None:
        corpus_hashes = corpus_hash_set(corpus_docs, text_col)
    s2 = (curated
          .withColumn("__h", F.md5(F.col(text_col)))
          .join(corpus_hashes, "__h", "left_anti")
          .drop("__h"))
    # near-dup vs corpus: cross-side pairs against the STORED bucket
    # index; any hit drops the new doc. Corpus text is touched only for
    # colliding docs (the exact-Jaccard verify's key-fetch).
    if corpus_minhash_index is None:
        corpus_minhash_index = minhash_bucket_index(corpus_docs,
                                                    text_col=text_col)
    near = (minhash_lsh_pairs_vs_index(
                s2.select("doc_id", text_col), corpus_docs,
                corpus_minhash_index, text_col=text_col)
            .select(F.col("src").alias("doc_id")).distinct())
    s3 = s2.join(near, "doc_id", "left_anti")
    # semantic vs corpus: cell-keyed, corpus wins; docs without an
    # embedding row pass through (no silent vanish)
    emb = embeddings_lookup.join(
        s3.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
    dropped = (semantic_dedup_between(emb, corpus_index, centroids,
                                      threshold=semantic_threshold)
               .filter(~F.col("kept"))
               .select(F.col("vec_id").alias("doc_id")))
    return (s3.join(dropped, "doc_id", "left_anti")
            .select("doc_id", "quality", "ws_tokens"))


def curate_dedup_ingest_stream(docs_stream: DataFrame,
                               benchmark: DataFrame,
                               corpus_docs: DataFrame,
                               corpus_index: DataFrame,
                               centroids: list[list[float]],
                               embeddings_lookup: DataFrame,
                               sink: Callable[[DataFrame, int], None],
                               semantic_threshold: float = 0.95,
                               text_col: str = "text",
                               check_ids: bool = True):
    """Run `ingest_accept_batch` per trigger via foreachBatch;
    `sink(accepted_df, batch_id)` receives each trigger's accepted
    (doc_id, quality, ws_tokens). ALL THREE standing-corpus artifacts —
    the exact-dedup hash set, the MinHash bucket index, and the
    benchmark-shingle Bloom bitmap — are precomputed ONCE here
    (checkpointed): triggers must never re-hash, re-shingle, or re-sign
    the corpus, and decontamination rides the fixed ≤ 256 KiB bitmap
    broadcast instead of re-broadcasting the benchmark n-gram set every
    micro-batch (its exact verify keeps the accepted set identical).
    Pass check_ids=False when upstream guarantees fresh doc_ids,
    dropping the per-trigger collision job. Returns the started
    StreamingQuery."""
    from ..operators.dedup import minhash_bucket_index
    from ..operators.sampling import benchmark_shingle_bloom

    hashes = corpus_hash_set(corpus_docs, text_col).localCheckpoint()
    mh_index = minhash_bucket_index(
        corpus_docs, text_col=text_col).localCheckpoint()
    bench_bloom = benchmark_shingle_bloom(
        benchmark, text_col=text_col).localCheckpoint()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(ingest_accept_batch(batch_df, benchmark, corpus_docs,
                                 corpus_index, centroids,
                                 embeddings_lookup,
                                 semantic_threshold, text_col,
                                 corpus_hashes=hashes,
                                 corpus_minhash_index=mh_index,
                                 check_ids=check_ids,
                                 benchmark_bloom=bench_bloom), batch_id)

    return (docs_stream.writeStream
            .foreachBatch(_process)
            .outputMode("append")
            .start())
