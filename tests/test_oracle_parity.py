"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its DuckDB oracle_sql() twin —
row-count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
                if math.isnan(v):
                    v = "NaN"
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]

    ora = ddb.execute(entrymod.oracle_sql()[name])
    cols = [d[0] for d in ora.description]
    duck_rows = [dict(zip(cols, r)) for r in ora.fetchall()]

    assert sorted(sdf.columns) == sorted(cols), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} duck={sorted(cols)}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    sn = _normalize(spark_rows, sdf.columns)
    dn = _normalize(duck_rows, cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_all_queries_have_entry():
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} without a queries() entry"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_covers_priority_queries():
    """The external gate checks only the FIRST 50 registered queries;
    pin the window so high-value entries never silently rotate out."""
    window = list(entrymod.queries())[:50]
    must_cover = {
        # composites (Q1/Q2) and the events domain that erred in round 2
        "recommend_focal_blend", "strategy_breakdown_focal",
        "event_weights_by_user", "events_hourly", "sessionization",
        "events_props_stats", "events_asof_order", "pk_violations",
        "events_value_histogram", "event_funnel", "weekly_retention",
        # dedup/ANN battery
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_incremental_minhash", "embedding_topk_lsh",
        "embedding_topk_ivf",
    }
    missing = must_cover - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"
    # every windowed entry must be hash-checkable (have an oracle twin)
    no_oracle = [n for n in window if n not in entrymod.oracle_sql()]
    assert not no_oracle, f"windowed entries without oracle: {no_oracle}"
