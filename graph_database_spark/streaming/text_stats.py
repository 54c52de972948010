"""Streaming maintenance of the BM25/TF-IDF corpus statistics.

The batch operator `operators.text.corpus_stats_rows` was shaped for
this from the start: per-document df contributions dedupe row-locally
(array_distinct before the explode), so the stats are a plain
explode → groupBy count — which Structured Streaming maintains as an
ordinary streaming aggregation whose state IS the stats table
(≈ 2·|vocab| + 1 rows, bounded by vocabulary, never by stream volume),
with micro-batch partials merging by addition. The same mergeability
argument as the count-min twin (`streaming.sketches`), and the same
publication discipline: epoch-dir + atomic pointer swap, so a retrieval
job reading df/avgdl mid-stream never sees a partial table.

Equivalence contract: replaying a document corpus through micro-batches
yields a stats table BIT-IDENTICAL to the batch operator on the same
corpus (tests/test_streaming_sketches.py) — a document must arrive in
exactly one micro-batch (append-only corpus feed), the usual exactly-
once source contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import corpus_stats_rows
from .sketches import read_current_sketch, run_streaming_cms


def streaming_corpus_stats(documents: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """(key, kind, n) streaming aggregate over a document stream — the
    identical expression chain as the batch operator (spread() is
    streaming-aware), run in complete mode."""
    return corpus_stats_rows(documents, text_col=text_col)


def run_streaming_corpus_stats(stats: DataFrame, out_path: str,
                               checkpoint_dir: str):
    """Maintain `out_path` as the current stats table with the atomic
    epoch-dir/pointer-swap publication (shared with the CMS twin —
    the state is vocabulary-bounded, so a complete-mode rewrite per
    micro-batch is bounded work). Returns the StreamingQuery."""
    return run_streaming_cms(stats, out_path, checkpoint_dir)


def read_current_stats(spark: SparkSession, out_path: str) -> DataFrame:
    """The last atomically-published stats table."""
    return read_current_sketch(spark, out_path)
