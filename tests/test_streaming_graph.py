"""Streaming graph updates: event edges built from a stream agree with
the batch builder's edge set (modulo the documented FIRST-vs-LWW dedup
difference, which the toy data's unique keys make moot)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.graphs.builder import build_edges
from graph_database_spark.sources.toy import toy_dataset
from graph_database_spark.streaming.graph_updates import event_edges_stream
from graph_database_spark.streaming.events import run_stream_to_memory


def test_stream_edges_match_batch_builder(spark, tmp_path):
    t = toy_dataset(spark)
    # stage the toy events as a parquet directory to stream from
    src = str(tmp_path / "events_stream")
    t["events"].write.parquet(src)
    stream = (spark.readStream
              .schema(t["events"].schema)
              .parquet(src))

    edges = event_edges_stream(stream, t["customers"], t["products"])
    q = run_stream_to_memory(edges, "ev_edges", output_mode="append")
    try:
        got = spark.sql(
            "SELECT src, dst, rel_type, event_id FROM ev_edges").collect()
    finally:
        q.stop()

    batch = (build_edges(t["products"], t["categories"], t["customers"],
                         t["orders"], t["order_items"], events=t["events"])
             .filter(F.col("event_id").isNotNull())
             .select("src", "dst", "rel_type", "event_id").collect())

    key = lambda r: (r["src"], r["dst"], r["rel_type"], r["event_id"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert len(got) > 0


def test_stream_edges_drop_fk_orphans(spark, tmp_path):
    t = toy_dataset(spark)
    import datetime as dt
    bad = spark.createDataFrame(
        [("E9", "NOPE", "P1", "view", dt.datetime(2024, 4, 3, 12, 0))],
        t["events"].schema)
    src = str(tmp_path / "events_bad")
    t["events"].unionByName(bad).write.parquet(src)
    stream = spark.readStream.schema(t["events"].schema).parquet(src)
    edges = event_edges_stream(stream, t["customers"], t["products"])
    q = run_stream_to_memory(edges, "ev_bad", output_mode="append")
    try:
        got = spark.sql("SELECT src FROM ev_bad").collect()
    finally:
        q.stop()
    assert all(not r["src"].endswith("NOPE") for r in got)
