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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

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


_POINTER = "CURRENT"


def run_streaming_cms(sketch: DataFrame, out_path: str,
                      checkpoint_dir: str):
    """Maintain `out_path` as the current sketch (complete mode — the
    state IS the fixed-size sketch, so a full rewrite per micro-batch is
    bounded work at any stream volume). Returns the StreamingQuery.

    Publication is atomic: each micro-batch writes `epoch=<n>/` under
    `out_path`, then swaps the `CURRENT` pointer file with os.replace
    (atomic on POSIX), so a concurrent probe via `read_current_sketch`
    never sees a missing or partial sketch — a plain mode('overwrite')
    rewrite would expose a delete-then-commit window. The previous
    epoch's directory is kept one swap before deletion so an in-flight
    reader of the old pointer still finds its files."""
    def write_batch(df: DataFrame, epoch: int) -> None:
        epoch_dir = os.path.join(out_path, f"epoch={epoch}")
        df.write.mode("overwrite").parquet(epoch_dir)
        fd, tmp = tempfile.mkstemp(dir=out_path, prefix=".ptr-")
        with os.fdopen(fd, "w") as f:
            f.write(f"epoch={epoch}")
        os.replace(tmp, os.path.join(out_path, _POINTER))
        for name in os.listdir(out_path):  # keep current + previous
            if (name.startswith("epoch=")
                    and int(name.split("=", 1)[1]) < epoch - 1):
                shutil.rmtree(os.path.join(out_path, name),
                              ignore_errors=True)
            elif name.startswith(".ptr-"):
                # a batch that crashed between mkstemp and os.replace
                # leaves its temp pointer behind forever; sweep stale
                # ones on each successful swap (ADVICE r5)
                try:
                    os.unlink(os.path.join(out_path, name))
                except OSError:
                    pass

    os.makedirs(out_path, exist_ok=True)
    return (sketch.writeStream
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(write_batch)
            .start())


def read_current_sketch(spark: SparkSession, out_path: str) -> DataFrame:
    """Probe-side reader: resolve the atomic `CURRENT` pointer to the
    published epoch directory."""
    with open(os.path.join(out_path, _POINTER)) as f:
        epoch_dir = f.read().strip()
    return spark.read.parquet(os.path.join(out_path, epoch_dir))


def streaming_hll(tokens: DataFrame, col: str = "token",
                  group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(group…, register, max_rank) streaming aggregate of a token
    stream — the identical construction as the batch
    `operators.sketches.hll_sketch` (its rank expressions are row-local
    and the sketch IS a max-aggregate, so Structured Streaming maintains
    it as ordinary aggregation state: ≤ m rows per group forever, and
    micro-batch partials merge by MAX — the HLL mergeability property).
    Publish with `run_streaming_cms` (complete-mode epoch/pointer swap)."""
    from ..operators.sketches import hll_sketch
    return hll_sketch(tokens, col=col, group_cols=group_cols)


def streaming_hdr(rows: DataFrame, int_col: str,
                  group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(group…, bucket, n) streaming aggregate of an integer-value
    stream — the identical construction as the batch
    `operators.sketches.hdr_sketch` (the bucket expression is row-local
    and the sketch IS a count-aggregate, so Structured Streaming
    maintains it as ordinary aggregation state, bounded by
    ≤ ~960 buckets per group forever; micro-batch partials merge by
    ADDITION — the histogram mergeability property). Publish with
    `run_streaming_cms` (complete-mode epoch/pointer swap); probe with
    `operators.sketches.hdr_quantiles` over the published table."""
    from ..operators.sketches import hdr_sketch
    return hdr_sketch(rows, int_col, group_cols=group_cols)


def streaming_bloom(keys: DataFrame, key_col: str,
                    num_bits: int = 1 << 21, k: int = 4) -> DataFrame:
    """(word, bits) streaming aggregate of a key stream — the identical
    construction as the batch `operators.sketches.bloom_build` (bit
    positions are row-local and the bitmap IS a bit_or aggregate, so
    Structured Streaming maintains it as ordinary aggregation state,
    bounded by num_bits/32 rows forever; micro-batch partials merge by
    bit_or — set-union mergeability). The live decontamination shape:
    benchmark suites stream in, the bitmap stays current, probes read
    the published epoch via `read_current_sketch` +
    `operators.sketches.bloom_may_contain`."""
    from ..operators.sketches import bloom_build
    return bloom_build(keys, key_col, num_bits, k)
