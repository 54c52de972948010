"""Streaming sessionization over the events stream.

The batch twin lives in operators.sessions; here the gap-based session is
the built-in `session_window` (Spark-first: a native stateful operator
rather than a hand-rolled applyInPandasWithState) keyed by user with a
watermark bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_sessions(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Per-user session aggregates: event count and value sum per session
    window (closes `gap` after the last event)."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )
