"""Text analysis for large-scale training-data pipelines (beyond-reference,
per the build brief): language-ID, quality scoring, token counting, document
fingerprinting. Everything is built from JVM-side `pyspark.sql.functions`
(regexp/hash/arithmetic inside whole-stage codegen) — zero Python UDFs — so
the same expressions scale to 100 TB and have exact DuckDB SQL twins.

Pattern constants are shared with the oracle SQL in registry.py so both
engines evaluate literally the same regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# language → stopword alternation (word-bounded). Deterministic heuristic:
# argmax of match counts, first-listed language wins ties, 'unknown' if all 0.
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it|was|for)\b",
    "fr": r"\b(le|la|les|des|et|une|est|dans|que|pour)\b",
    "es": r"\b(el|los|las|una|es|que|en|por|con|para)\b",
    "de": r"\b(der|die|das|und|ist|von|mit|den|dem|ein)\b",
    "zh": r"[一-鿿]",
}
LANG_ORDER = ("en", "fr", "es", "de", "zh")

WS_TOKEN_PATTERN = r"\S+"
# BPE-ish pre-tokenization: letter runs, single digits, punctuation runs
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"
PUNCT_PATTERN = r"[.,;:!?]"
EN_STOPWORD_PATTERN = LANG_PATTERNS["en"]


def _match_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): stopword-profile n-gram heuristic."""
    low = F.lower(F.col(text_col))
    counts = {lang: _match_count(low, pat).alias(f"c_{lang}")
              for lang, pat in LANG_PATTERNS.items()}
    df = documents.select("doc_id", *counts.values())
    g = F.greatest(*[F.col(f"c_{lang}") for lang in LANG_ORDER])
    pred = F.when(g == 0, F.lit("unknown"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"c_{lang}") == g, F.lit(lang))
    return df.select("doc_id", pred.alias("pred_lang"))


def text_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, word_count, punct_ratio, stopword_ratio, quality):
    length/punctuation/stopword heuristics combined into a [0,1] score.
    Rational arithmetic only (no exp/log) so the score is bit-identical
    across engines."""
    text = F.col(text_col)
    words = _match_count(text, WS_TOKEN_PATTERN)
    punct = _match_count(text, PUNCT_PATTERN)
    stop = _match_count(F.lower(text), EN_STOPWORD_PATTERN)
    word_count = F.when(words > 0, words).otherwise(F.lit(1))
    punct_ratio = punct / word_count
    stop_ratio = stop / word_count
    quality = (
        F.least(words.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.25
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25
    )
    return documents.select(
        "doc_id",
        words.alias("word_count"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace and BPE-ish regex
    pre-tokenization counts."""
    text = F.col(text_col)
    return documents.select(
        "doc_id",
        _match_count(text, WS_TOKEN_PATTERN).alias("ws_tokens"),
        _match_count(text, BPE_TOKEN_PATTERN).alias("bpe_tokens"),
    )


def normalized_text(text: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical form fingerprints
    and exact-dedup hash over."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of the normalized text."""
    return documents.select(
        "doc_id", F.md5(normalized_text(F.col(text_col))).alias("fingerprint"))
