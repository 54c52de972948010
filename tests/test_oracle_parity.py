"""Local replica of the driver's correctness gate: run every queries()
entry and compare against its DuckDB oracle_sql() twin — row-count,
column names, and order-insensitive values. Defaults to sf0.001 for
speed; set SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 to replay the
driver's exact scale before a window rotation."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR",
                        "/root/testdata/sf0.001")
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


AB_KEYS = sorted(__import__(
    "graph_database_spark.registry", fromlist=["AB_ORACLES"]
).AB_ORACLES.keys())


@pytest.mark.parametrize("name", AB_KEYS)
def test_ab_query_matches_oracle(spark, ddb, name):
    """Harness-only A/B baselines (demoted from the driver registry —
    r11: dedup_semantic) keep their local value gate even though they
    no longer ship through __spark_entry__.queries()."""
    from graph_database_spark.registry import AB_ORACLES, AB_QUERIES

    assert name not in entrymod.queries(), (
        f"{name} is in both the driver registry and AB_QUERIES")
    sdf = AB_QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    ora = ddb.execute(AB_ORACLES[name])
    cols = [d[0] for d in ora.description]
    duck_rows = [dict(zip(cols, r)) for r in ora.fetchall()]
    assert sorted(sdf.columns) == sorted(cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, cols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_covers_priority_queries():
    """The external gate checks only the FIRST 50 registered queries;
    pin the window so high-value entries never silently rotate out."""
    window = list(entrymod.queries())[:50]
    must_cover = {
        # round-12 rotation (r11 verdict next-round #2): the ENTIRE
        # r8-stale cohort — emptying it is the round's done-criterion
        "ann_ndcg_lsh", "connected_components", "customer_value_deciles",
        "decontaminate_bloom", "doc_sample_weighted_exact_n",
        "multimodal_frame_sample", "multimodal_resize_plan",
        "strategy_breakdown_focal", "top_parts_by_revenue",
        # spot-pins from the 38-entry r9 cohort: the iterative/heavy
        # paths whose re-verification matters most
        "pagerank_global", "ppr_batch_focal", "graph_hyperanf_diameter",
        "sssp_weighted_fixed8", "shortest_paths_landmark",
        "dedup_incremental_minhash", "bm25_topk",
        # the 3 oldest-r10 fillers (training_negatives was never
        # re-verified; connected_components_star is the r11 verdict #7
        # regression watch)
        "training_negatives", "adjacency_row_norm",
        "connected_components_star",
    }
    missing = must_cover - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"
    # every windowed entry must be hash-checkable (have an oracle twin)
    no_oracle = [n for n in window if n not in entrymod.oracle_sql()]
    assert not no_oracle, f"windowed entries without oracle: {no_oracle}"


def test_driver_window_head_pinned():
    """The first 50 QUERIES names (the driver's correctness window) must
    be exactly _DRIVER_WINDOW_PRIORITY, regardless of how the per-domain
    modules under queries/ are imported or reordered."""
    from graph_database_spark.registry import _DRIVER_WINDOW_PRIORITY
    assert list(entrymod.queries())[:50] == list(_DRIVER_WINDOW_PRIORITY)
    assert len(_DRIVER_WINDOW_PRIORITY) == 50
