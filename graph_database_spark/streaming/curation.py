"""Streaming document curation: the ingest-time quality gate (beyond the
reference, per the training-data-pipeline brief).

The batch curation metrics (`operators/text.py`: language-ID, quality
score, token counts, PII counts) are all ROW-LOCAL Column expressions —
no aggregation, no join — so they apply to an unbounded stream verbatim:
a stateless `select`/`filter` over each micro-batch, no watermark, no
state store. That is the property that makes the curation battery
deployable at the ingest edge of a 100 TB/day feed: every metric is
computed once, in-flight, before the data ever lands.

Stream/batch equivalence is by construction (the very same Column
expressions), and `tests/test_streaming_curation.py` asserts it by
driving the testdata corpus through a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.text import (
    PII_ORDER, PII_PATTERNS, lang_pred_col, quality_col, _match_count,
    WS_TOKEN_PATTERN,
)


def annotate_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + (pred_lang, quality, ws_tokens, n_email, n_ipv4,
    n_phone): every curation metric as one stateless projection."""
    text = F.col(text_col)
    return docs.select(
        "*",
        lang_pred_col(text).alias("pred_lang"),
        quality_col(text).alias("quality"),
        _match_count(text, WS_TOKEN_PATTERN).alias("ws_tokens"),
        *[_match_count(text, PII_PATTERNS[k]).alias(f"n_{k}")
          for k in PII_ORDER])


def curation_filter_stream(docs: DataFrame, lang: str = "en",
                           min_quality: float = 0.5, min_tokens: int = 50,
                           max_tokens: int = 10_000,
                           reject_pii: bool = True,
                           text_col: str = "text") -> DataFrame:
    """(doc_id, quality, ws_tokens): docs passing the ingest gate —
    target language, quality floor, token budget, and (optionally) zero
    PII matches. Stateless, so it runs identically on a stream or a
    batch frame; benchmark decontamination stays a batch/foreachBatch
    concern because it needs the corpus-vs-benchmark join."""
    ann = annotate_stream(docs, text_col)
    cond = ((F.col("pred_lang") == F.lit(lang))
            & (F.col("quality") >= min_quality)
            & (F.col("ws_tokens") >= min_tokens)
            & (F.col("ws_tokens") <= max_tokens))
    if reject_pii:
        for k in PII_ORDER:
            cond = cond & (F.col(f"n_{k}") == 0)
    return ann.filter(cond).select("doc_id", "quality", "ws_tokens")
