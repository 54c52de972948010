"""Streaming SCD2 maintenance vs its batch twin: feeding the event log in
micro-batches (ordered per user across batches — the CDC contract) must
leave the maintained table exactly equal to one-shot status_history."""

from __future__ import annotations

from datetime import datetime as DT

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from graph_database_spark.operators.relational_ext import status_history
from graph_database_spark.streaming.scd import run_scd2_maintenance

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
])

# three users, statuses that collapse, change, and change back — split so
# batch boundaries fall mid-run (the collapse must bridge micro-batches)
BATCH1 = [(1, DT(2024, 1, 1), 7, "view"),
          (2, DT(2024, 1, 2), 7, "view"),
          (3, DT(2024, 1, 1), 8, "click"),
          (4, DT(2024, 1, 1), 9, "buy")]
BATCH2 = [(5, DT(2024, 1, 3), 7, "view"),      # still collapses with batch 1
          (6, DT(2024, 1, 4), 7, "buy"),        # change
          (7, DT(2024, 1, 2), 8, "click")]      # 8 unchanged
BATCH3 = [(8, DT(2024, 1, 5), 7, "view"),       # change back
          (9, DT(2024, 1, 3), 8, "view")]       # 8 finally changes


def _rows(df):
    return sorted(
        (r["user_id"], r["status"], r["valid_from"], r["valid_to"],
         r["version"]) for r in df.collect())


def test_scd2_stream_matches_batch_twin(spark, tmp_path):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "scd")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate((BATCH1, BATCH2, BATCH3)):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1) \
            .write.parquet(f"{feed}/b{i}")

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "*.parquet")
              .parquet(feed + "/*"))
    q = run_scd2_maintenance(stream, table, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = spark.createDataFrame(
        BATCH1 + BATCH2 + BATCH3, EVENTS_SCHEMA)
    expected = _rows(status_history(all_events))
    got = _rows(spark.read.parquet(table))
    assert got == expected
    # spot-check the semantic shape: user 7 is view → buy → view
    u7 = [r for r in got if r[0] == 7]
    assert [r[1] for r in u7] == ["buy", "view", "view"] \
        or [r[1] for r in sorted(u7, key=lambda r: r[4])] \
        == ["view", "buy", "view"]
    assert sorted(r[4] for r in u7) == [1, 2, 3]


def test_scd2_single_batch_bootstrap(spark, tmp_path):
    """First batch with no existing table bootstraps it."""
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "scd")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(BATCH1, EVENTS_SCHEMA).coalesce(1) \
        .write.parquet(f"{feed}/b0")
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("pathGlobFilter", "*.parquet").parquet(feed + "/*"))
    q = run_scd2_maintenance(stream, table, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _rows(spark.read.parquet(table))
    expected = _rows(status_history(
        spark.createDataFrame(BATCH1, EVENTS_SCHEMA)))
    assert got == expected
