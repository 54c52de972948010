"""Score normalization (SURVEY §2.4 A7/A8).

- max-normalize: score / max(score) (tp1 `_normalize_scores`,
  tp1/knoledge_graphs/recommendation.py:190-196; empty/zero-max input → 0s).
- l1-normalize: score / Σ score (the personalization normalization,
  recommendation.py:181-188; all-zero → uniform 1/N).

Both are a scalar aggregate joined back via a crossJoin of a 1-row total —
a broadcast, not a shuffle; never `.collect()` in the pipeline path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def max_normalize(scores: DataFrame, score_col: str = "score") -> DataFrame:
    total = scores.agg(F.max(score_col).alias("__max"))
    return (
        scores.crossJoin(F.broadcast(total))
        .select(
            *[c for c in scores.columns if c != score_col],
            F.when(F.col("__max") > 0, F.col(score_col) / F.col("__max"))
             .otherwise(F.lit(0.0)).alias(score_col),
        )
    )


def l1_normalize(scores: DataFrame, score_col: str = "score") -> DataFrame:
    """score / Σscore; if Σ == 0, uniform 1/N (recommendation.py:181-188)."""
    total = scores.agg(F.sum(score_col).alias("__sum"),
                       F.count(F.lit(1)).alias("__n"))
    return (
        scores.crossJoin(F.broadcast(total))
        .select(
            *[c for c in scores.columns if c != score_col],
            F.when(F.col("__sum") > 0, F.col(score_col) / F.col("__sum"))
             .otherwise(F.lit(1.0) / F.col("__n")).alias(score_col),
        )
    )
