"""BFS shortest paths and connected components on crafted + toy graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.graphs.traversal import (
    connected_components, shortest_paths,
)


@pytest.fixture(scope="module")
def crafted(spark):
    # two components: a-b-c-d chain, e-f pair; g isolated
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")], ["src", "dst"])
    vertices = spark.createDataFrame(
        [(v,) for v in "abcdefg"], ["id"])
    return vertices, edges


def test_connected_components(crafted):
    vertices, edges = crafted
    got = {r["id"]: r["component"]
           for r in connected_components(vertices, edges,
                                         num_partitions=4).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "e": "e", "f": "e", "g": "g"}


def test_shortest_paths(spark, crafted):
    _, edges = crafted
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
    landmarks = spark.createDataFrame([("a",)], ["id"])
    got = {(r["id"], r["landmark"]): r["dist"]
           for r in shortest_paths(sym, landmarks, num_partitions=4).collect()}
    assert got == {("a", "a"): 0, ("b", "a"): 1, ("c", "a"): 2, ("d", "a"): 3}


def test_toy_cooccurrence_paths(spark, toy):
    from graph_database_spark.operators.cooccurrence import (
        cooccurrence_unordered, symmetrize,
    )
    cooc = symmetrize(cooccurrence_unordered(toy["order_items"]))
    landmarks = spark.createDataFrame([("P1",)], ["id"])
    got = {r["id"]: r["dist"]
           for r in shortest_paths(cooc.select("src", "dst"), landmarks,
                                   num_partitions=4).collect()}
    # P1—P2—P4 chain (FIXTURES §3 adjacency); P3 unreachable
    assert got == {"P1": 0, "P2": 1, "P4": 2}
