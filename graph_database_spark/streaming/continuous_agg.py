"""Continuous aggregate: a streaming-maintained rollup table.

The hypertable-style pattern: an hourly (window × event_type) rollup of
the events stream kept up to date as micro-batches arrive, queryable as
a plain parquet table between batches. Spark pieces: complete-mode
windowed aggregation (state = the rollup itself, bounded by hours ×
types — dimension-sized) + `foreachBatch` sink with a checkpoint, which
gives exactly-once refresh semantics: on restart the checkpoint replays
the last uncommitted epoch and the overwrite is idempotent.

Scale boundaries, stated honestly: complete-mode + full overwrite is the
right call exactly while the ROLLUP is dimension-sized (hours × types —
it is, regardless of event volume). A fact-sized rollup (per-user-hour)
needs update-mode output merged into a transactional table (Delta/
Iceberg MERGE; jars not in this environment) — the foreachBatch hook
below is where that MERGE would slot in, unchanged otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type, n, sum_value) streaming aggregate (complete
    mode: no watermark — state is the dimension-sized rollup)."""
    return (events
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("hour"), "event_type",
                    "n", "sum_value"))


def run_continuous_rollup(agg: DataFrame, out_path: str,
                          checkpoint_dir: str):
    """Maintain `out_path` as the current rollup: every micro-batch
    rewrites it atomically-enough for parquet (overwrite of a
    dimension-sized table). Returns the StreamingQuery."""
    def write_batch(df: DataFrame, _epoch: int) -> None:
        df.write.mode("overwrite").parquet(out_path)

    return (agg.writeStream
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(write_batch)
            .start())
