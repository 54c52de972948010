"""Entity resolution: blocked fuzzy matching (beyond-reference).

The all-pairs edit-distance join is quadratic and never survives scale;
the production shape is BLOCK → VERIFY: a cheap deterministic blocking
key bounds each candidate group, then the expensive string metric runs
only inside blocks. Here the blocking key is the name's leading-token
prefix (sorted-neighborhood / prefix blocking — the standard recall
trade-off, documented per key choice), and verification is JVM
`levenshtein` — no UDFs, and the DuckDB oracle replays the identical
block + verify pipeline.

At 100 TB the blocking key is the shuffle key; prefix blocks are small
and uniform by construction (no stop-token skew axis the way
share-any-token blocking has), so the quadratic verify stage is bounded
by max-block-size², not corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_name_matches(df: DataFrame, id_col: str, name_col: str,
                         prefix_tokens: int = 2,
                         max_distance: int = 12,
                         max_block_size: int | None = None) -> DataFrame:
    """(src, dst, distance): pairs whose names share the first
    `prefix_tokens` words and are within `max_distance` edits.

    One self-join on the block key; `src < dst` halves the pair space;
    levenshtein evaluates only inside blocks.

    max_block_size drops blocks with more members than the cap before the
    self-join (standard ER oversize-block pruning): per-block pair output
    is quadratic in block size, so one degenerate prefix shared by k names
    contributes k² rows — the cap bounds the verify stage at cap² per
    block no matter how the prefix distribution degrades at scale. Blocks
    that big are near-constant prefixes carrying no discriminating signal
    anyway. The count is one extra aggregate on the same block key the
    join shuffles on.
    """
    toks = F.split(F.trim(F.col(name_col)), r"\s+")
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        # slice (not element_at) tolerates names shorter than the prefix:
        # they block on their full token list instead of erroring
        F.concat_ws(" ", F.slice(toks, 1, prefix_tokens)).alias("__block"),
    )
    if max_block_size is not None:
        oversized = (keyed.groupBy("__block")
                     .agg(F.count(F.lit(1)).alias("__bc"))
                     .filter(F.col("__bc") > max_block_size)
                     .select("__block"))
        keyed = keyed.join(F.broadcast(oversized), "__block", "left_anti")
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, on=(F.col("a.__block") == F.col("b.__block"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("src"),
                F.col("b.__id").alias("dst"),
                F.levenshtein(F.col("a.__name"), F.col("b.__name"))
                 .alias("distance"))
        .filter(F.col("distance") <= max_distance)
    )
