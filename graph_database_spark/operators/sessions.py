"""Event-stream session and time-window analytics.

The reference treats `events` as an append-only interaction log
(tp2/postgres/init/01_schema.sql:32-39); these operators are the batch
forms of the natural stream analytics over it (SURVEY §2.9) — the
streaming twins live in graph_database_spark.streaming.

Sessionization is the lag-gap-cumsum idiom: one shuffle on user_id, all
window work inside partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts + value sums per event type."""
    return (
        events
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
             .cast("double").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds `gap_minutes`. Returns the events plus a
    session_id column (user-scoped ordinal)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    is_new = (
        F.col(ts_col).cast("long")
        - F.lag(F.col(ts_col).cast("long")).over(w) > gap_s
    ).cast("int")
    return events.withColumn(
        "session_id",
        F.sum(F.coalesce(is_new, F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session count and mean session length in events."""
    s = sessionize(events, gap_minutes)
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
    )
