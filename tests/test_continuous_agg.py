"""Continuous rollup: the foreachBatch-maintained parquet table equals
the batch aggregation of the same input, and a restart from the same
checkpoint is a no-op (exactly-once refresh)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.continuous_agg import (
    hourly_rollup, run_continuous_rollup,
)
from graph_database_spark.streaming.events import read_event_stream

SF_DIR = "/root/testdata/sf0.001"


def _batch_rollup(spark):
    return (load_table(spark, SF_DIR, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .cast("double").alias("sum_value")))


def test_rollup_table_matches_batch(spark, tmp_path):
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    q = run_continuous_rollup(
        hourly_rollup(read_event_stream(spark, SF_DIR)), out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"])
            for r in _batch_rollup(spark).collect()}
    assert got == want and got


def test_restart_from_checkpoint_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):  # second start resumes the same checkpoint
        q = run_continuous_rollup(
            hourly_rollup(read_event_stream(spark, SF_DIR)), out, ckpt)
        q.processAllAvailable()
        q.stop()
    got = {(r["hour"], r["event_type"]): r["n"]
           for r in spark.read.parquet(out).collect()}
    want = {(r["hour"], r["event_type"]): r["n"]
            for r in _batch_rollup(spark).collect()}
    assert got == want
