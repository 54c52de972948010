"""Scalar functions (F1-F6), connectors (S2-S4), streaming sessions."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from graph_database_spark.functions import (
    parse_date, parse_timestamp, round6, safe_double, safe_int, weighted_blend,
)
from graph_database_spark.sources.connectors import (
    healthcheck, read_csv, read_graph, write_graph,
)

TMP = "/root/repo/.tmp_test"


def test_scalar_parsers(spark):
    df = spark.createDataFrame(
        [("2024-04-01T10:15:00Z", "2024-01-02", "29.99", "7", "junk")],
        ["ts", "d", "price", "qty", "bad"])
    row = df.select(
        parse_timestamp("ts").alias("ts"),
        parse_date("d").alias("d"),
        safe_double("price").alias("p"),
        safe_int("qty").alias("q"),
        safe_double("bad").alias("b"),
        round6(F.lit(0.1234567)).alias("r"),
    ).first()
    assert str(row["ts"]) == "2024-04-01 10:15:00"
    assert str(row["d"]) == "2024-01-02"
    assert row["p"] == 29.99 and row["q"] == 7
    assert row["b"] is None  # try_cast, not a crash (F3 coercion guard)
    assert row["r"] == 0.123457


def test_weighted_blend(spark):
    df = spark.createDataFrame([(1.0, None), (0.5, 0.5)], ["a", "b"])
    got = [r["s"] for r in df.select(
        weighted_blend({"a": 0.4, "b": 0.3}).alias("s")).collect()]
    assert got == [pytest.approx(0.4), pytest.approx(0.35)]


def test_csv_roundtrip_and_graph_sink(spark, toy):
    os.makedirs(TMP, exist_ok=True)
    try:
        # CSV with explicit schema (S2)
        csv_path = f"{TMP}/products.csv"
        toy["products"].write.mode("overwrite").option("header", True).csv(csv_path)
        schema = StructType([
            StructField("id", StringType()), StructField("name", StringType()),
            StructField("price", StringType()), StructField("category_id", StringType()),
        ])
        back = read_csv(spark, csv_path, schema)
        assert back.count() == 4

        # graph sink (S4): partitioned vertex/edge parquet
        from graph_database_spark.graphs.builder import build_edges, build_vertices
        v = build_vertices(toy["customers"], toy["categories"],
                           toy["products"], toy["orders"])
        e = build_edges(toy["products"], toy["categories"], toy["customers"],
                        toy["orders"], toy["order_items"], toy["events"])
        paths = write_graph(v, e, f"{TMP}/graph")
        v2, e2 = read_graph(spark, f"{TMP}/graph")
        assert v2.count() == v.count()
        assert e2.count() == e.count()
        # rel_type partition pruning reaches the file listing
        assert set(os.listdir(paths["edges"])) >= {"rel_type=CONTAINS",
                                                   "rel_type=PLACED"}
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_healthcheck(spark):
    assert healthcheck(spark) is True


def test_streaming_sessions(spark):
    from graph_database_spark.streaming.events import (
        read_event_stream, run_stream_to_memory,
    )
    from graph_database_spark.streaming.sessions import streaming_sessions
    stream = read_event_stream(spark, "/root/testdata/sf0.001")
    agg = streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
    # session windows only emit in append mode after watermark
    # closure (needs a later batch) — complete mode drives a one-batch test
    q = run_stream_to_memory(agg, "sess", output_mode="complete")
    try:
        rows = spark.sql("SELECT * FROM sess").collect()
    finally:
        q.stop()
    assert rows
    for r in rows[:50]:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_orc_roundtrip(spark, tmp_path):
    from graph_database_spark.sources.connectors import read_orc, write_orc
    from graph_database_spark.sources.testdata import load_table
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(src.columns)
    assert back.count() == src.count()


def test_csv_json_roundtrip(spark, tmp_path):
    from graph_database_spark.sources.connectors import (
        read_csv, read_json, write_csv, write_json)
    from graph_database_spark.sources.testdata import load_table
    src = load_table(spark, "/root/testdata/sf0.001", "region")
    cpath, jpath = str(tmp_path / "r_csv"), str(tmp_path / "r_json")
    write_csv(src, cpath)
    write_json(src, jpath)
    assert read_csv(spark, cpath, src.schema).count() == src.count()
    assert read_json(spark, jpath, src.schema).count() == src.count()


def test_events_loader_handles_both_ts_vintages(spark, tmp_path):
    """events.parquet has shipped with ts as TIMESTAMP(NANOS) and as
    timestamp[us]; load_table must normalize both to an identical
    session-TZ timestamp column (the r2 regression: the loader assumed
    nanos unconditionally and broke on the us vintage)."""
    import datetime
    import pyarrow as pa
    import pyarrow.parquet as pq
    from graph_database_spark.sources.testdata import load_table

    base = [datetime.datetime(2024, 3, 1, 12, 0, 0, 250000),
            datetime.datetime(2024, 3, 2, 0, 30, 59, 999999)]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["view", "purchase"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    for vintage, unit in (("us_dir", "us"), ("ns_dir", "ns")):
        d = tmp_path / vintage
        d.mkdir()
        t = pa.table({**cols, "ts": pa.array(base, pa.timestamp(unit))})
        pq.write_table(t, str(d / "events.parquet"))

    got = {}
    for vintage in ("us_dir", "ns_dir"):
        df = load_table(spark, str(tmp_path / vintage), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", vintage
        got[vintage] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect())
    assert got["us_dir"] == got["ns_dir"]
    assert [ts for _, ts in got["us_dir"]] == base
