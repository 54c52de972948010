"""Deterministic top-K (SURVEY §2.5 W1/W2).

Reference: tp1's _top_items sorts by (-score, product_id) then slices
(tp1/knoledge_graphs/recommendation.py:231-240); tp2's Cypher omits the
tie-break (nondeterministic). We always apply the ascending-id tie-break.

Spark executes orderBy().limit() as TakeOrderedAndProject — a per-partition
heap + driver merge, no global sort — so top-K over 100 TB never
materializes a full ordering. Per-group top-K uses a ranking window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k(df: DataFrame, n: int, score_col: str = "score",
          id_col: str = "product_id") -> DataFrame:
    """Global deterministic top-N: (-score, id) ordering, take n."""
    return df.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)


def top_k_per_group(df: DataFrame, n: int, group_col: str,
                    score_col: str = "score",
                    id_col: str = "product_id") -> DataFrame:
    """Per-group deterministic top-N via row_number window.

    The batch-idiomatic form of the per-customer recommendation endpoint
    (SURVEY §7.1 step 7): one shuffle on group_col, rank inside partitions.
    """
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
