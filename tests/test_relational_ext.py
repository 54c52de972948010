"""Relational-extension operators: semantic invariants beyond the oracle
parity test (which covers value-level equality per registry entry), plus
the batch↔stream agreement for the sliding-window twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table
from graph_database_spark.operators.relational_ext import (
    interval_followups, rolling_monthly_revenue, salted_type_counts,
    sliding_window_counts, nation_revenue_share,
)
from graph_database_spark.streaming.events import (
    read_event_stream, run_stream_to_memory, sliding_window_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_interval_followups_covers_every_trigger(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = interval_followups(ev).collect()
    n_signups = ev.filter("event_type = 'signup'").count()
    # left join: one row per trigger, including zero-followup ones
    assert len(out) == n_signups
    assert any(r["n_followups"] > 0 for r in out)


def test_rolling_revenue_frame_matches_manual_sum(spark):
    rows = rolling_monthly_revenue(
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "customer"),
        load_table(spark, SF_DIR, "nation")).collect()
    by_nation = {}
    for r in sorted(rows, key=lambda r: (r["n_name"], r["yr"], r["mon"])):
        hist = by_nation.setdefault(r["n_name"], [])
        hist.append(r["revenue"])
        expect = round(sum(hist[-3:]), 2)
        assert abs(r["rolling_rev"] - expect) < 0.02, (r, expect)


def test_salted_counts_equal_plain_groupby(spark):
    ev = load_table(spark, SF_DIR, "events")
    salted = {r["event_type"]: r["n_events"]
              for r in salted_type_counts(ev).collect()}
    plain = {r["event_type"]: r["count"]
             for r in ev.groupBy("event_type").count().collect()}
    assert salted == plain


def test_sliding_windows_double_count(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = sliding_window_counts(ev)
    # window=2×slide ⇒ every event is in exactly 2 panes
    assert (out.agg(F.sum("n")).first()[0] == 2 * ev.count())


def test_nation_share_sums_to_one_per_region(spark):
    out = nation_revenue_share(
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "customer"),
        load_table(spark, SF_DIR, "nation"),
        load_table(spark, SF_DIR, "region"))
    per_region = (out.groupBy("r_name").agg(F.sum("region_share").alias("s"))
                  .collect())
    assert per_region and all(abs(r["s"] - 1.0) < 1e-4 for r in per_region)


def test_sliding_stream_matches_batch(spark):
    stream = read_event_stream(spark, SF_DIR)
    q = run_stream_to_memory(
        sliding_window_counts_stream(stream), "slidew", output_mode="update")
    try:
        got = spark.sql(
            "SELECT window_start, event_type, n FROM slidew").collect()
    finally:
        q.stop()
    batch = sliding_window_counts(
        load_table(spark, SF_DIR, "events")).collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert {key(r): r["n"] for r in got} == {key(r): r["n"] for r in batch}


def test_interval_join_stream_matches_batch_pairs(spark):
    from graph_database_spark.streaming.events import (
        interval_join_stream, run_stream_to_memory)
    stream = read_event_stream(spark, SF_DIR)
    q = run_stream_to_memory(interval_join_stream(stream), "sjoin",
                             output_mode="append")
    try:
        got = spark.sql(
            "SELECT trigger_id, response_ts FROM sjoin").collect()
    finally:
        q.stop()
    ev = load_table(spark, SF_DIR, "events")
    batch = interval_followups(ev).filter("n_followups > 0").collect()
    # total matched pairs equals the batch sum of followup counts
    assert len(got) == sum(r["n_followups"] for r in batch)
    assert {r["trigger_id"] for r in got} \
        == {r["event_id"] for r in batch}


def test_copresence_stream_matches_batch_pairs(spark):
    from graph_database_spark.operators.relational_ext import (
        temporal_copresence,
    )
    from graph_database_spark.streaming.events import (
        copresence_stream, run_stream_to_memory)
    stream = read_event_stream(spark, SF_DIR)
    q = run_stream_to_memory(copresence_stream(stream), "scop",
                             output_mode="append")
    try:
        got = spark.sql("SELECT user_a, user_b FROM scop").collect()
    finally:
        q.stop()
    batch = temporal_copresence(
        load_table(spark, SF_DIR, "events"), 60).collect()
    # every matched event pair appears exactly once in the stream output
    assert len(got) == sum(r["n_copresent"] for r in batch)
    assert {(r["user_a"], r["user_b"]) for r in got} \
        == {(r["user_a"], r["user_b"]) for r in batch}


def test_value_anomalies_median_mad(spark):
    from datetime import datetime as DT
    from graph_database_spark.operators.relational_ext import value_anomalies
    ts = DT(2024, 1, 1)
    # 'view': values 1..9 (med 5, mad 2) plus one 100 outlier;
    # 'flat': constant → mad 0 → never flags
    rows = [(i, 1, ts, "view", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9])]
    rows += [(100, 1, ts, "view", 100.0, "{}")]
    rows += [(200 + i, 1, ts, "flat", 7.0, "{}") for i in range(5)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"])
    got = {r["event_id"]: r for r in value_anomalies(ev, k=3.0).collect()}
    # med(view)=5.5 (10 values incl. 100), deviations |v-5.5|:
    # .5,1.5,2.5,3.5,4.5,.5,1.5,2.5,3.5,94.5 → mad 2.5; cutoff 7.5 → only 100
    assert set(got) == {100}
    assert got[100]["med"] == 5.5 and got[100]["mad"] == 2.5


def test_hourly_interpolation_linear_and_edges(spark):
    """Observed h0=1.0 and h4=5.0 interpolate 2/3/4 across the gap; a
    type observed once carries its value across every edge hour."""
    import datetime as dt

    from graph_database_spark.operators.relational_ext import (
        hourly_value_interpolated,
    )
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 1, "a", 1.0, None),
        (2, t0 + dt.timedelta(hours=4), 1, "a", 5.0, None),
        (3, t0 + dt.timedelta(hours=2), 1, "b", 7.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r["event_type"], r["hour"].hour): (r["observed"], r["value"])
           for r in hourly_value_interpolated(ev).collect()}
    assert got[("a", 0)] == (True, 1.0)
    assert got[("a", 1)] == (False, 2.0)
    assert got[("a", 2)] == (False, 3.0)
    assert got[("a", 3)] == (False, 4.0)
    assert got[("a", 4)] == (True, 5.0)
    assert got[("b", 2)] == (True, 7.0)
    for h in (0, 1, 3, 4):  # edge gaps carry the nearest observation
        assert got[("b", h)] == (False, 7.0)


def test_event_transitions_rows_normalize_and_count(spark):
    from graph_database_spark.operators.relational_ext import event_transitions
    ev = load_table(spark, SF_DIR, "events")
    out = event_transitions(ev).collect()
    # transition edges = events - users (each user loses its first event)
    n_pairs = sum(r["n"] for r in out)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_pairs == n_events - n_users
    # each prev_type row of the matrix sums to ~1
    by_prev = {}
    for r in out:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-4, (prev, tot)


def test_value_trend_recovers_planted_slope(spark):
    from graph_database_spark.operators.relational_ext import value_trend_by_type
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(hours=i), "up", 10.0 + 2.0 * (i / 24.0))
            for i in range(100)]
    rows += [(100 + i, t0 + dt.timedelta(hours=i), "flat", 7.5)
             for i in range(100)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    got = {r["event_type"]: r for r in value_trend_by_type(df).collect()}
    assert got["up"]["slope_per_day"] == 2.0
    assert got["up"]["intercept"] == 10.0
    assert got["up"]["r"] == 1.0
    assert got["flat"]["slope_per_day"] == 0.0
    assert got["flat"]["intercept"] == 7.5
    assert got["flat"]["r"] is None  # constant y: correlation undefined
