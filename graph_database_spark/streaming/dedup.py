"""Streaming deduplication for continuous document ingest (beyond the
reference, per the training-data-pipeline brief; the reference's only
"stream" is ETL replay, tp2/README.md:479-484).

Two production shapes:

1. **Exact dedup at ingest** — `dropDuplicatesWithinWatermark` on the
   content hash. State is keyed by md5(text) and bounded by the watermark
   horizon, so a 100 TB/day feed holds only the horizon's worth of hashes,
   not the corpus. First occurrence wins (the same LWW-adjacent convention
   as the graph sink's MERGE).

2. **Incremental near-dup vs a standing corpus** — each micro-batch runs
   the batch-proven cross-side MinHash+LSH operator
   (`operators/dedup.minhash_lsh_pairs_between`) against a static corpus
   frame inside `foreachBatch`. Pairs are cross-side only, and every
   stream doc lands in exactly one micro-batch, so the union of per-batch
   outputs equals the one-shot batch answer — which is exactly what the
   equivalence test asserts. At 100 TB the corpus side is a precomputed
   signature/bucket-index table (signatures are append-only); per trigger
   the new batch — not the corpus — bounds the quadratic stage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..operators.dedup import minhash_lsh_pairs_between

DOCUMENTS_STREAM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def read_document_stream(spark: SparkSession, docs_dir: str,
                         glob: str = "documents.parquet",
                         max_files_per_trigger: int | None = None
                         ) -> DataFrame:
    """Streaming scan of a documents parquet directory (Kafka stand-in)."""
    reader = (spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
              .option("pathGlobFilter", glob))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(docs_dir)


def exact_dedup_stream(docs: DataFrame, watermark: str = "10 minutes",
                       text_col: str = "text") -> DataFrame:
    """First-occurrence-wins exact dedup over a document stream.

    Keys state on md5(text) with an ingest-time watermark:
    `dropDuplicatesWithinWatermark` expires a hash from state once the
    watermark passes it, so memory is bounded by the horizon's traffic —
    the non-negotiable property for an unbounded 100 TB/day feed (plain
    `dropDuplicates` on a stream retains state forever).
    """
    return (
        docs
        .withColumn("__ingest_ts", F.current_timestamp())
        .withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark("__ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("__ingest_ts")
    )


def incremental_minhash_stream(docs_stream: DataFrame, corpus: DataFrame,
                               sink: Callable[[DataFrame, int], None],
                               num_hashes: int = 64, bands: int = 16,
                               n: int = 3, threshold: float = 0.5,
                               text_col: str = "text"):
    """Near-dup each micro-batch of new docs against a static corpus.

    Returns the started StreamingQuery; `sink(pairs_df, batch_id)`
    receives the verified (src=new doc, dst=corpus doc, jaccard) pairs
    per trigger. foreachBatch gives each trigger a BATCH DataFrame, so
    the exact operator the driver oracle-checks (`dedup_incremental_minhash`)
    runs unchanged — stream/batch equivalence by construction, not by a
    parallel reimplementation.
    """
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = minhash_lsh_pairs_between(
            batch_df, corpus, num_hashes=num_hashes, bands=bands,
            n=n, threshold=threshold, text_col=text_col)
        sink(pairs, batch_id)

    return (docs_stream.writeStream
            .foreachBatch(_process)
            .outputMode("append")
            .start())
