"""Structured Streaming over the append-only events surface (SURVEY §2.9).

The reference has no streaming; its `events` table is the natural stream
(append-only interactions with ts, tp2/postgres/init/01_schema.sql:32-39;
README frames ETL re-runs as "replaying" events, tp2/README.md:479-484).
This module is the streaming twin of the batch event-weight pipeline
(P6 + A2): readStream → watermark → tumbling-window weighted aggregation.

Design notes for scale: the aggregation state is keyed by
(window, user_id) — bounded by the watermark horizon; `update` output mode
emits refinements, `append` waits for watermark closure. A parquet
directory source here stands in for Kafka; the transformations are
source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from ..operators.weights import EVENT_WEIGHTS_DRIVER, event_weight_col


def _events_stream_schema(ts_is_nanos: bool) -> StructType:
    # driver events.parquet schema; ts is either raw int64 nanos (legacy
    # vintage, read as long) or a proper timestamp[us] column
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", LongType() if ts_is_nanos else TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_event_stream(spark: SparkSession, events_dir: str,
                      glob: str = "events.parquet") -> DataFrame:
    """Streaming scan of an events parquet directory with a proper
    timestamp column. `glob` selects the event files when the directory
    holds other tables (the driver testdata layout).

    Streaming sources need an explicit schema, so probe the parquet once
    with a batch read (footer-only, no data scan) to learn which ts
    vintage this directory carries — int64 nanos or timestamp[us] —
    and shape the stream schema + conversion to match.
    """
    probe_path = os.path.join(events_dir, glob)
    raw_probe = _raw_events_read(spark, probe_path)
    ts_is_nanos = dict(raw_probe.dtypes).get("ts") == "bigint"
    if ts_is_nanos:
        # DELIBERATE session-wide side effect, nanos vintage only: the
        # flag must stay set for the stream's whole lifetime (micro-batch
        # reads re-resolve the parquet schema), so it cannot be restored
        # here. Consequence while set: other nanos-timestamp parquet in
        # this session also reads ts as int64 — convert via
        # sources.testdata.load_table, which branches on the dtype.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (spark.readStream.schema(_events_stream_schema(ts_is_nanos))
           .option("pathGlobFilter", glob)
           .parquet(events_dir))
    if ts_is_nanos:
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def _raw_events_read(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read the events parquet without normalization, tolerating the
    nanos vintage (which needs the legacy flag just to load). The probe's
    schema inspection is lazy-safe: dtypes come from the footer."""
    try:
        return spark.read.parquet(path)
    except Exception:
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            return spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def windowed_event_weights(events: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "10 minutes",
                           weights: dict[str, float] | None = None) -> DataFrame:
    """Tumbling-window Σ event-weight per user — streaming form of
    tp1 graph.py:64-68 with late-data handling the reference lacks."""
    w = event_weight_col(F.col("event_type"),
                         weights or EVENT_WEIGHTS_DRIVER)
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "user_id")
        .agg(F.sum(w).alias("weight"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "user_id", "weight")
    )


def sliding_window_counts_stream(events: DataFrame,
                                 window: str = "1 hour",
                                 slide: str = "30 minutes",
                                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of operators/relational_ext.sliding_window_counts:
    overlapping (window, slide) count per event type. Same window()
    semantics as the batch form — each event lands in window/slide
    overlapping panes — so batch and stream results are comparable
    row-for-row once the watermark closes a pane. State is keyed by
    (window, event_type), bounded by the watermark horizon."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n")
    )


def interval_join_stream(events: DataFrame,
                         trigger_type: str = "signup",
                         response_type: str = "purchase",
                         horizon_hours: int = 24,
                         watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: triggers ⋈ responses by the same user
    within (trigger_ts, trigger_ts + horizon] — the streaming twin of
    operators/relational_ext.interval_followups' matching pairs.

    Both sides carry watermarks and the join condition bounds response_ts
    relative to trigger_ts, so Spark can expire join state: a buffered
    trigger is dropped once the response watermark passes its horizon,
    and vice versa — state is bounded by (horizon + watermark) of
    traffic, not the stream length. This is THE operator that makes
    event-correlation pipelines feasible as streams at 100 TB/day.

    Returns (trigger_id, user_id, trigger_ts, response_ts) matched pairs
    (append mode; aggregation to per-trigger counts happens downstream —
    chaining another streaming agg after a stream-stream join needs
    Spark's multiple-stateful-operator support and an output-mode
    trade-off, so the count twin stays batch).
    """
    trig = (events.filter(F.col("event_type") == trigger_type)
            .select(F.col("event_id").alias("trigger_id"),
                    "user_id", F.col("ts").alias("trigger_ts"))
            .withWatermark("trigger_ts", watermark))
    resp = (events.filter(F.col("event_type") == response_type)
            .select(F.col("user_id").alias("r_user"),
                    F.col("ts").alias("response_ts"))
            .withWatermark("response_ts", watermark))
    return trig.join(
        resp,
        (trig["user_id"] == resp["r_user"])
        & (resp["response_ts"] > trig["trigger_ts"])
        & (resp["response_ts"] <= trig["trigger_ts"]
           + F.expr(f"INTERVAL {horizon_hours} HOURS")),
    ).select("trigger_id", "user_id", "trigger_ts", "response_ts")


def copresence_stream(events: DataFrame,
                      window_seconds: int = 60,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators/relational_ext.temporal_copresence:
    cross-user event pairs within `window_seconds`, as matched pair rows
    (append mode; the per-pair count aggregation stays batch, same
    trade-off as interval_join_stream).

    The batch operator's bin-bucketing is what makes this FEASIBLE as a
    stream: a keyless time-range stream-stream join would buffer
    everything against everything, but with the earlier side exploded
    into (bin, bin+1) the join is an EQUI join on bin — state shards by
    bin, and the watermark + range condition lets Spark expire each
    bin's buffer once event time passes it. Same exactly-once pair
    matching as the batch proof (the two bin cases are mutually
    exclusive).
    """
    w_us = int(window_seconds) * 1_000_000
    bin_col = F.expr(f"unix_micros(ts) div {w_us}")
    base = events.select("user_id", "ts")
    left = (base.withWatermark("ts", watermark)
            .select(F.col("user_id").alias("l_user"),
                    F.col("ts").alias("l_ts"),
                    F.explode(F.array(bin_col, bin_col + 1)).alias("bin")))
    right = (base.withWatermark("ts", watermark)
             .select(F.col("user_id").alias("r_user"),
                     F.col("ts").alias("r_ts"),
                     bin_col.alias("bin")))
    return (
        left.join(
            right,
            (left["bin"] == right["bin"])
            & (right["r_ts"] > left["l_ts"])
            & (right["r_ts"] <= left["l_ts"]
               + F.expr(f"INTERVAL {window_seconds} SECONDS"))
            & (left["l_user"] != right["r_user"]))
        .select(F.least("l_user", "r_user").alias("user_a"),
                F.greatest("l_user", "r_user").alias("user_b"),
                "l_ts", "r_ts")
    )


def run_stream_to_memory(agg: DataFrame, query_name: str,
                         output_mode: str = "update"):
    """Drive a streaming aggregation to completion against a static
    directory (test/smoke harness): memory sink + processAllAvailable."""
    q = (agg.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    return q
