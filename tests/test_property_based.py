"""Property-based tests (hypothesis): Spark operators vs plain-Python
reference computations on randomized small inputs — the semantics oracle
that doesn't depend on the fixed testdata."""

from __future__ import annotations

import datetime as dt
from collections import Counter
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from graph_database_spark.operators.cooccurrence import cooccurrence_unordered
from graph_database_spark.operators.weights import (
    EVENT_WEIGHTS_REFERENCE, event_weights,
)
from graph_database_spark.operators.sessions import session_stats

ORDERS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)),  # (order, product)
    min_size=0, max_size=30)

EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 4),
              st.sampled_from(["view", "click", "add_to_cart", "bogus"])),
    min_size=0, max_size=30)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=ORDERS)
def test_cooccurrence_matches_reference_combinations(spark, items):
    """tp1 graph.py:55-62 semantics on arbitrary item sets: distinct
    (order, product), combinations counted once per order."""
    df = spark.createDataFrame(
        [(f"O{o}", f"P{p}") for o, p in items] or [("O_", "P_")],
        ["order_id", "product_id"])
    if not items:
        df = df.limit(0)
    got = {(r["src"], r["dst"]): r["count"]
           for r in cooccurrence_unordered(df).collect()}

    per_order: dict[str, set] = {}
    for o, p in set(items):
        per_order.setdefault(f"O{o}", set()).add(f"P{p}")
    expected: Counter = Counter()
    for prods in per_order.values():
        for a, b in combinations(sorted(prods), 2):
            expected[(a, b)] += 1
    assert got == dict(expected)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=EVENTS)
def test_event_weights_matches_reference(spark, events):
    """tp1 graph.py:64-68: summed weights, unknown types weigh 0."""
    ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(f"C{c}", f"P{p}", t, ts) for c, p, t in events]
        or [("C_", "P_", "view", ts)],
        ["customer_id", "product_id", "event_type", "ts"])
    if not events:
        df = df.limit(0)
    got = {(r["customer_id"], r["product_id"]): r["weight"]
           for r in event_weights(df).collect()}
    expected: dict = {}
    for c, p, t in events:
        k = (f"C{c}", f"P{p}")
        expected[k] = expected.get(k, 0.0) + EVENT_WEIGHTS_REFERENCE.get(t, 0.0)
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(gaps=st.lists(st.integers(1, 7200), min_size=1, max_size=20))
def test_sessionization_gap_property(spark, gaps):
    """Session count == 1 + number of gaps > threshold (single user)."""
    t = dt.datetime(2024, 1, 1)
    times = [t]
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        times.append(t)
    df = spark.createDataFrame(
        [(1, ts, "view", 1.0) for ts in times],
        ["user_id", "ts", "event_type", "value"])
    row = session_stats(df, gap_minutes=30).first()
    expected_sessions = 1 + sum(1 for g in gaps if g > 1800)
    assert row["n_sessions"] == expected_sessions
    # avg is rounded to 6dp in the operator, so the product carries up to
    # n_sessions * 5e-7 of rounding error
    assert row["n_sessions"] * row["avg_events_per_session"] == pytest.approx(
        len(times), abs=1e-4)
