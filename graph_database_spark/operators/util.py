"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input for compute-heavy per-row derivations.

    Small parquet files scan as one partition (maxPartitionBytes), which
    serializes CPU-bound work like shingling, signature hashing, or
    per-row dot products. A round-robin repartition to the session's
    default parallelism restores full-width execution; it's a cheap
    shuffle of the narrow input, never of the derived (wide) data.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
