"""Golden-output tests for PageRank against the values captured from the
reference tp1 engine (FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.cooccurrence import (
    cooccurrence_unordered, symmetrize, row_normalized_adjacency,
)
from graph_database_spark.graphs.pagerank import pagerank, pagerank_batch

GOLDEN_GLOBAL = {"P1": 0.244544, "P2": 0.463293, "P3": 0.047619, "P4": 0.244544}
# strategy_breakdown C3 personalized (seeds={P1}) raw ranks normalized by max
# aren't the raw ranks; raw PPR ranks appear via recommend tests instead.


@pytest.fixture(scope="module")
def toy_graph(spark, toy):
    items = toy["order_items"]
    pairs = symmetrize(cooccurrence_unordered(items))
    adj = row_normalized_adjacency(pairs)
    vertices = toy["products"].select("id")
    return vertices, adj


def test_toy_adjacency(toy_graph):
    _, adj = toy_graph
    got = {(r["src"], r["dst"]): round(r["weight"], 6) for r in adj.collect()}
    assert got == {
        ("P1", "P2"): 1.0,
        ("P2", "P1"): 0.5,
        ("P2", "P4"): 0.5,
        ("P4", "P2"): 1.0,
    }


def test_global_pagerank_golden(toy_graph):
    vertices, adj = toy_graph
    ranks = pagerank(vertices, adj, num_partitions=4)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(GOLDEN_GLOBAL)
    for k, v in GOLDEN_GLOBAL.items():
        assert got[k] == pytest.approx(v, abs=1e-4), k


def test_pagerank_batch_matches_single(spark, toy_graph):
    vertices, adj = toy_graph
    # personalized on seeds {P1} (customer C3's seed set)
    pers = spark.createDataFrame([("c", "P1", 1.0)], ["key", "id", "p"])
    single = pagerank(
        vertices, adj,
        personalization=spark.createDataFrame([("P1", 1.0)], ["id", "p"]),
        num_partitions=4)
    batch = pagerank_batch(vertices, adj, pers, num_partitions=4)
    s = {r["id"]: r["rank"] for r in single.collect()}
    b = {r["id"]: r["rank"] for r in batch.filter(F.col("key") == "c").collect()}
    assert set(s) == set(b)
    for k in s:
        assert b[k] == pytest.approx(s[k], abs=1e-9), k
