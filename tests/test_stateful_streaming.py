"""applyInPandasWithState: state must persist across micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table
from graph_database_spark.streaming.events import read_event_stream
from graph_database_spark.streaming.stateful import cumulative_user_weights
from graph_database_spark.operators.weights import (
    EVENT_WEIGHTS_DRIVER, event_weight_col,
)

TMP = "/root/repo/.tmp_stream"


def test_cumulative_weights_across_batches(spark):
    os.makedirs(TMP, exist_ok=True)
    src = f"{TMP}/in"
    os.makedirs(src, exist_ok=True)
    try:
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        # micro-batch 1: first half; micro-batch 2: second half
        first = ev.filter(F.col("event_id") < 500)
        second = ev.filter(F.col("event_id") >= 500)
        # write with raw nanos schema intact? the stream reader rebuilds ts
        # from long nanos — write the already-converted frame instead and
        # read with an adjusted schema (ts is a proper timestamp here)
        stream_schema = first.schema
        first.write.mode("append").parquet(src)

        raw = (spark.readStream.schema(stream_schema)
               .parquet(src))
        agg = cumulative_user_weights(raw)
        q = (agg.writeStream.outputMode("update")
             .format("memory").queryName("cum").start())
        try:
            q.processAllAvailable()
            second.write.mode("append").parquet(src)
            q.processAllAvailable()
            # update mode appends one emission per touched user per batch;
            # the lifetime total is the emission with the highest n_events
            got = {}
            for r in spark.sql("SELECT * FROM cum").collect():
                cur = got.get(r["user_id"])
                if cur is None or r["n_events"] > cur[1]:
                    got[r["user_id"]] = (r["total_weight"], r["n_events"])
        finally:
            q.stop()

        expected = {
            r["user_id"]: (r["w"], r["n"])
            for r in ev.groupBy("user_id").agg(
                F.sum(event_weight_col(F.col("event_type"),
                                       EVENT_WEIGHTS_DRIVER)).alias("w"),
                F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(got) == set(expected)
        mismatches = {u: (got[u], expected[u]) for u in expected
                      if got[u][0] != pytest.approx(expected[u][0])
                      or got[u][1] != expected[u][1]}
        assert not mismatches, list(mismatches.items())[:5]
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_streaming_transitions_match_batch(spark):
    from graph_database_spark.streaming.stateful import transition_pairs_stream
    from graph_database_spark.operators.relational_ext import event_transitions
    os.makedirs(TMP, exist_ok=True)
    src = f"{TMP}/in_trans"
    os.makedirs(src, exist_ok=True)
    try:
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        # event_id is event-time-ordered in the synthetic feed, so an
        # id-split preserves per-user arrival order across batches
        first = ev.filter(F.col("event_id") < 400)
        second = ev.filter((F.col("event_id") >= 400)
                           & (F.col("event_id") < 700))
        third = ev.filter(F.col("event_id") >= 700)
        first.write.mode("append").parquet(src)
        raw = spark.readStream.schema(first.schema).parquet(src)
        q = (transition_pairs_stream(raw)
             .writeStream.outputMode("append")
             .format("memory").queryName("trans").start())
        try:
            q.processAllAvailable()
            second.write.mode("append").parquet(src)
            q.processAllAvailable()
            third.write.mode("append").parquet(src)
            q.processAllAvailable()
            got = {(r["prev_type"], r["next_type"]): r["n"]
                   for r in spark.sql(
                       "SELECT prev_type, next_type, COUNT(*) AS n "
                       "FROM trans GROUP BY 1, 2").collect()}
        finally:
            q.stop()
        expected = {(r["prev_type"], r["next_type"]): r["n"]
                    for r in event_transitions(ev).collect()}
        assert got == expected
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_streaming_exact_n_matches_batch(spark):
    from graph_database_spark.streaming.sampling import exact_n_sample_stream
    from graph_database_spark.operators.sampling import stratified_exact_n
    os.makedirs(TMP, exist_ok=True)
    src = f"{TMP}/in_sample"
    os.makedirs(src, exist_ok=True)
    try:
        docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
            .select("doc_id", "source")
        first = docs.filter(F.col("doc_id") % 3 == 0)
        second = docs.filter(F.col("doc_id") % 3 == 1)
        third = docs.filter(F.col("doc_id") % 3 == 2)
        first.write.mode("append").parquet(src)
        raw = spark.readStream.schema(first.schema).parquet(src)
        q = (exact_n_sample_stream(raw, n=5)
             .writeStream.outputMode("update")
             .format("memory").queryName("resv").start())
        try:
            q.processAllAvailable()
            second.write.mode("append").parquet(src)
            q.processAllAvailable()
            third.write.mode("append").parquet(src)
            q.processAllAvailable()
            # keep each source's final reservoir (highest version)
            got = {}
            for r in spark.sql("SELECT * FROM resv").collect():
                cur = got.setdefault(r["source"], (set(), -1))
                if r["version"] > cur[1]:
                    got[r["source"]] = ({r["doc_id"]}, r["version"])
                elif r["version"] == cur[1]:
                    cur[0].add(r["doc_id"])
        finally:
            q.stop()
        expected = {}
        for r in stratified_exact_n(docs, 5).collect():
            expected.setdefault(r["source"], set()).add(r["doc_id"])
        assert {s: ids for s, (ids, _) in got.items()} == expected
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
