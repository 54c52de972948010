"""Structured Streaming event-weight pipeline: drive the static sf0.001
events file through the streaming query and check it agrees with the
equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.events import (
    read_event_stream, run_stream_to_memory, windowed_event_weights,
)
from graph_database_spark.operators.weights import (
    EVENT_WEIGHTS_DRIVER, event_weight_col,
)

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_event_weights_matches_batch(spark):
    stream = read_event_stream(spark, SF_DIR)
    agg = windowed_event_weights(stream, window="1 hour",
                                 watermark="10 minutes")
    q = run_stream_to_memory(agg, "wev", output_mode="update")
    try:
        got = spark.sql(
            "SELECT window_start, user_id, weight FROM wev").collect()
    finally:
        q.stop()

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "user_id")
        .agg(F.sum(event_weight_col(F.col("event_type"),
                                    EVENT_WEIGHTS_DRIVER)).alias("weight"))
        .collect()
    )
    got_m = {(r["window_start"], r["user_id"]): r["weight"] for r in got}
    batch_m = {(r["window_start"], r["user_id"]): r["weight"] for r in batch}
    assert got_m == batch_m
    assert len(got_m) > 0
