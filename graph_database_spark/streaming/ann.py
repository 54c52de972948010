"""Streaming ANN index maintenance: LSH signatures over an embedding
ingest stream.

Hyperplane signature assignment is stateless per vector, so the BATCH
operator (`operators/ann.lsh_signatures`) runs unchanged on a streaming
DataFrame in append mode — each micro-batch appends its (id, table,
bucket) rows to the signature table, and because the hyperplanes are
seed-deterministic closure constants, the accumulated table is
bit-identical to a batch build over the same vectors (asserted in
tests/test_streaming_ann.py). That is the incremental-ingest story for
similarity search: new embeddings become searchable one micro-batch
after arrival, with zero recompute of the standing index — the same
shape as the dedup (`streaming/dedup.py`) and sketch
(`streaming/sketches.py`) twins.

Queries keep using `cosine_topk_lsh`'s candidate join against the
appended table; IVF would follow the same pattern with periodically
re-trained centroids (a model-refresh concern, not a streaming one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.ann import lsh_signatures


def streaming_lsh_signatures(embeddings: DataFrame, dim: int = 64,
                             bits: int = 4, tables: int = 12,
                             seed: int = 42,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) signature stream — the batch operator applied
    to a streaming frame (stateless, append-mode safe)."""
    return lsh_signatures(embeddings, dim, bits, tables, seed,
                          id_col, vec_col)


def incremental_semantic_stream(emb_stream: DataFrame,
                                corpus_index: DataFrame,
                                centroids: list[list[float]],
                                sink, threshold: float = 0.95,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                two_level: bool | None = None,
                                coarse_probe: int = 1):
    """SemDeDup each micro-batch of new embeddings against a standing
    corpus's STORED cell index (`operators/ann.semantic_cell_index`) —
    the semantic twin of `streaming/dedup.incremental_minhash_stream`.

    foreachBatch hands each trigger a batch DataFrame, so the exact
    cross-side operator (`semantic_dedup_between`) runs unchanged;
    because the corpus always wins, per-vector keep/drop decisions are
    independent of batching and the union of per-batch outputs equals
    the one-shot answer (asserted in tests/test_streaming_ann.py).
    `sink(decisions_df, batch_id)` receives (vec_id, cell, centroid_cos,
    kept) per trigger. Returns the started StreamingQuery.

    `two_level=None` auto-dispatches each micro-batch's cell assignment
    on the standing corpus's nlist (same boundary as
    `semantic_dedup_auto`), so ingest against a 10⁹-vector corpus never
    broadcasts the corpus-proportional fine-centroid matrix — the coarse
    routing table is the only closure constant. The stored corpus_index
    must have been assigned with the same path; pin an explicit bool on
    both sides where bit-replayability matters."""
    from ..operators.ann import semantic_dedup_between, _auto_two_level

    if two_level is None:
        two_level = _auto_two_level(len(centroids),
                                    "incremental_semantic_stream")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(semantic_dedup_between(batch_df, corpus_index, centroids,
                                    threshold, id_col, vec_col,
                                    two_level=two_level,
                                    coarse_probe=coarse_probe), batch_id)

    return (emb_stream.writeStream
            .foreachBatch(_process)
            .outputMode("append")
            .start())


def run_signature_ingest(signatures: DataFrame, out_path: str,
                         checkpoint_dir: str):
    """Append each micro-batch's signatures to the index table; the
    checkpoint gives exactly-once appends across restarts. Returns the
    StreamingQuery."""
    return (signatures.writeStream
            .outputMode("append")
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_dir)
            .start())
