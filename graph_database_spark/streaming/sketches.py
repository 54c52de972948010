"""Streaming count-min sketch: the mergeable counter maintained over a
token stream.

This is WHY `operators/sketches.count_min_sketch` rejected the
conservative-update variant: the standard sketch is a pure groupBy-count
over (depth, slot), so Structured Streaming maintains it with ordinary
streaming aggregation state — bounded by depth×width rows FOREVER, no
watermark needed, and every micro-batch's partial sums merge by
addition. The batch operator and this stream produce IDENTICAL sketches
over the same data (asserted in tests/test_streaming_sketches.py),
which is the formal meaning of "mergeable".

Heavy-hitter probes read the maintained sketch table between batches —
the classic "monitor the stream's hot keys with O(1) memory" pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.sketches import _cms_slots


def streaming_cms(tokens: DataFrame, depth: int = 4,
                  width: int = 2048) -> DataFrame:
    """(depth, slot, n) streaming aggregate of a token stream — same
    construction as the batch `count_min_sketch`; state = the sketch
    itself (≤ depth·width rows regardless of stream volume)."""
    return (tokens
            .select(F.posexplode(
                _cms_slots(F.col("token"), depth, width))
                .alias("depth", "slot"))
            .groupBy("depth", "slot")
            .agg(F.count(F.lit(1)).alias("n")))


def run_streaming_cms(sketch: DataFrame, out_path: str,
                      checkpoint_dir: str):
    """Maintain `out_path` as the current sketch (complete mode — the
    state IS the fixed-size sketch, so a full rewrite per micro-batch is
    bounded work at any stream volume). Returns the StreamingQuery."""
    def write_batch(df: DataFrame, _epoch: int) -> None:
        df.write.mode("overwrite").parquet(out_path)

    return (sketch.writeStream
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(write_batch)
            .start())
