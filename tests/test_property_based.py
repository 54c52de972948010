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


STATUS_EVENTS = st.lists(
    st.tuples(st.integers(0, 3),                    # user
              st.integers(0, 20),                   # day offset
              st.sampled_from(["a", "b", "c"])),    # status
    min_size=0, max_size=25)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=STATUS_EVENTS)
def test_status_history_properties(spark, events):
    """SCD2 invariants on arbitrary event logs: per user, (1) intervals
    chain valid_to == next valid_from with exactly one open row, (2) no
    two consecutive intervals share a status, (3) the interval sequence
    equals the run-length collapse of the (ts, event_id)-ordered log."""
    from graph_database_spark.operators.relational_ext import status_history
    rows = [(i + 1, u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), s)
            for i, (u, d, s) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(0, 0, dt.datetime(2024, 1, 1), "a")],
        ["event_id", "user_id", "ts", "event_type"])
    if not rows:
        df = df.limit(0)
    got: dict[int, list] = {}
    for r in status_history(df).collect():
        got.setdefault(r["user_id"], []).append(r)
    for u, ivs in got.items():
        ivs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]
        assert ivs[-1]["valid_to"] is None
        assert sum(r["valid_to"] is None for r in ivs) == 1
    # reference collapse
    expected: dict[int, list] = {}
    for eid, u, ts, s in sorted(rows, key=lambda r: (r[2], r[0])):
        seq = expected.setdefault(u, [])
        if not seq or seq[-1] != s:
            seq.append(s)
    assert {u: [r["status"] for r in ivs] for u, ivs in got.items()} \
        == {u: seq for u, seq in expected.items() if seq}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                     max_size=40))
def test_winsorized_bounds_and_sum(spark, vals):
    """Winsorized stats invariants: lo ≤ hi both inside [min, max];
    clipped_sum within [n·lo, n·hi] and equal to the plain-Python clip."""
    from graph_database_spark.operators.relational_ext import (
        winsorized_value_stats)
    ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, ts, 1, "t", float(v), "{}") for i, v in enumerate(vals)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"])
    r = winsorized_value_stats(df).collect()[0]
    assert round(min(vals), 6) <= r["lo"] <= r["hi"] <= round(max(vals), 6)
    expected = round(sum(round(min(max(v, r["lo"]), r["hi"]), 6)
                         for v in vals), 6)
    assert r["clipped_sum"] == pytest.approx(expected, abs=1e-6)
    assert r["n_events"] == len(vals)


COPRESENCE_EVENTS = st.lists(
    st.tuples(st.integers(0, 4),            # user
              st.integers(0, 400)),         # seconds offset
    min_size=0, max_size=25)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=COPRESENCE_EVENTS)
def test_temporal_copresence_matches_bruteforce(spark, events):
    """Bin-bucketed band join vs the O(n²) definition on random event
    streams: every cross-user pair with 0 < Δt ≤ W, counted once."""
    from graph_database_spark.operators.relational_ext import (
        temporal_copresence,
    )
    W = 60
    base = dt.datetime(2024, 1, 1)
    rows = [(i, u, base + dt.timedelta(seconds=s))
            for i, (u, s) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(0, 0, base)], ["event_id", "user_id", "ts"])
    if not rows:
        df = df.limit(0)
    got = {(r["user_a"], r["user_b"]): r["n_copresent"]
           for r in temporal_copresence(df, W).collect()}

    expected: Counter = Counter()
    for (i, (ua, sa)) in enumerate(events):
        for (j, (ub, sb)) in enumerate(events):
            if ua != ub and 1 <= sb - sa <= W:
                expected[(min(ua, ub), max(ua, ub))] += 1
    assert got == dict(expected)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.text(alphabet="ab ", min_size=1, max_size=12),
                      min_size=1, max_size=6))
def test_unigram_logprob_matches_python_model(spark, texts):
    """Spark unigram LM vs a plain-Python one on random tiny corpora."""
    import math
    from graph_database_spark.operators.text import unigram_logprob

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob(df).collect()}

    toks_per_doc = {i: [w for w in t.lower().split()] for i, t in docs}
    counts: Counter = Counter()
    for ws in toks_per_doc.values():
        counts.update(ws)
    T, U = sum(counts.values()), len(counts)
    for i, ws in toks_per_doc.items():
        if not ws:
            assert i not in got
            continue
        s = sum(round(math.log(counts[w] + 1), 9) for w in ws)
        want = round(s / len(ws) - math.log(T + U + 1), 6)
        n, lp = got[i]
        assert n == len(ws)
        assert lp == pytest.approx(want, abs=2e-6)


def test_skew_caps_bound_pair_fanout(spark):
    """Adversarial skew fixtures: the caps are the only thing standing
    between these inputs and a quadratic pair explosion, so this test
    FAILS if either cap is removed.

    (a) one power customer with 5,000 products: the capped incidence
        must contribute at most C(m,2) pair rows, not C(5000,2)≈12.5M;
    (b) one stop-shingle present in EVERY document: the doc-frequency
        guard must drop it, leaving zero candidate pairs instead of
        C(n_docs,2)."""
    from pyspark.sql import functions as F

    from graph_database_spark.operators.dedup import ngram_jaccard_pairs
    from graph_database_spark.operators.similarity import (
        cap_products_per_customer, jaccard_pairs,
    )

    # --- (a) power customer -------------------------------------------
    m = 128
    power = [("whale", p) for p in range(5000)]
    normal = [(f"c{c}", p) for c in range(20) for p in range(c, c + 3)]
    inc = spark.createDataFrame(power + normal,
                                ["customer_id", "product_id"])
    capped = cap_products_per_customer(inc, m)
    # the documented bound: every customer contributes C(min(k, m), 2)
    per_customer = {r["customer_id"]: r["n"] for r in
                    capped.groupBy("customer_id")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_customer["whale"] == m
    bound = sum(n * (n - 1) // 2 for n in per_customer.values())
    pairs = (capped.alias("a")
             .join(capped.alias("b"),
                   (F.col("a.customer_id") == F.col("b.customer_id"))
                   & (F.col("a.product_id") < F.col("b.product_id")))
             .count())
    assert pairs == bound <= m * (m - 1) // 2 + 20 * 3
    # and the full operator stays well under the uncapped 12.5M pairs
    out = jaccard_pairs(capped.distinct())
    assert out.count() <= bound

    # --- (b) stop-shingle in every doc --------------------------------
    stop = "lorem ipsum dolor"
    docs = spark.createDataFrame(
        [(i, f"{stop} unique{i}a unique{i}b unique{i}c unique{i}d")
         for i in range(150)],
        ["doc_id", "text"])
    guarded = ngram_jaccard_pairs(docs, n=3, threshold=0.01,
                                  max_shingle_freq=100)
    assert guarded.count() == 0  # C(150,2)=11,175 without the guard


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_coarse_quantizer_invariants_random_unit_vectors(data):
    """coarse_quantizer on ARBITRARY unit-norm centroid lists (the r10
    two-level SemDeDup routing table, pure driver-side numpy): routing
    must stay in range; fine cell j must route to a coarse cell whose
    dot with it ties 1.0 (itself, or an EARLIER duplicate of itself —
    so every coarse cell is non-empty unless a duplicate owns its
    members: the precise pigeonhole invariant, asserted below per cell);
    and the mapping must equal the brute-force (dot DESC, id ASC)
    argmax the SQL oracle replays."""
    import numpy as np

    from graph_database_spark.operators.ann import coarse_quantizer

    nlist = data.draw(st.integers(1, 40))
    dim = data.draw(st.integers(2, 8))
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(rng_seed)
    cmat = rng.normal(size=(nlist, dim))
    # duplicates allowed: copy a row onto another sometimes
    if nlist >= 2 and data.draw(st.booleans()):
        cmat[data.draw(st.integers(0, nlist - 1))] = \
            cmat[data.draw(st.integers(0, nlist - 1))]
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    cents = [row.tolist() for row in cmat]

    n_coarse, f2c = coarse_quantizer(cents)
    assert 1 <= n_coarse <= nlist
    assert len(f2c) == nlist
    assert all(0 <= c < n_coarse for c in f2c)
    # brute-force replay: first max == (dot DESC, id ASC)
    sims = cmat @ cmat[:n_coarse].T
    assert f2c == [int(r.argmax()) for r in sims]
    # pigeonhole: unit-norm self-dot is a row max, ties to lower id,
    # so fine cell j routes to a coarse cell whose dot ties 1.0 —
    # coarse cell j is non-empty unless an EARLIER duplicate owns it,
    # in which case the owning cell holds all its duplicates
    routed = set(f2c)
    for j in range(n_coarse):
        assert sims[j, f2c[j]] >= 1.0 - 1e-9
        # non-duplicate coarse cells are genuinely non-empty: if no
        # earlier coarse centroid ties coarse centroid j at dot≈1.0,
        # fine cell j itself must have routed INTO coarse cell j
        dup_of_earlier = any(sims[i, j] >= 1.0 - 1e-9 for i in range(j))
        if not dup_of_earlier:
            assert j in routed, (
                f"coarse cell {j} has no earlier duplicate but no fine "
                f"cell routed to it — pigeonhole invariant broken")
