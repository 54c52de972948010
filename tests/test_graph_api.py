"""PropertyGraph facade: the one-handle graph surface over the toy seed
(reference dataset, sources/toy.py) — construction, degrees, motifs,
algorithms, subgraphs, save/load round-trip, integrity checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.graphs.api import PropertyGraph
from graph_database_spark.sources.toy import toy_dataset


@pytest.fixture(scope="module")
def graph(spark):
    t = toy_dataset(spark)
    return PropertyGraph.from_tables(
        t["customers"], t["categories"], t["products"], t["orders"],
        t["order_items"], events=t["events"])


def test_degrees_cover_all_vertices(graph):
    deg = graph.degrees(direction="both").collect()
    assert len(deg) == graph.vertices.count()
    assert all(r["degree"] >= 0 for r in deg)
    # every order placed exactly once → in-degree of Order nodes is ≥ 1
    order_in = {r["id"]: r["degree"]
                for r in graph.degrees(direction="in").collect()
                if r["id"].startswith("Order:")}
    assert order_in and all(d >= 1 for d in order_in.values())


def test_motif_matches_cypher_pattern(graph):
    # tp2's co-occurrence pattern (tp2/app/main.py:98-105)
    m = graph.find("(p1)<-[:CONTAINS]-(o)-[:CONTAINS]->(p2)") \
        .filter(F.col("p1") != F.col("p2"))
    assert m.count() > 0
    # symmetric: each unordered pair appears in both orientations
    a = {(r["p1"], r["p2"]) for r in m.select("p1", "p2").collect()}
    assert all((b, x) in a for x, b in a)


def test_pagerank_on_contains_projection(graph):
    pr = graph.page_rank(rel_type="CONTAINS", max_iter=30)
    rows = pr.collect()
    assert len(rows) == graph.vertices.count()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_connected_components_product_category(graph):
    cc = graph.connected_components(rel_type="IN_CATEGORY").collect()
    comp = {r["id"]: r["component"] for r in cc}
    # products of the same category share a component
    by_cat = graph.edges.filter("rel_type = 'IN_CATEGORY'") \
        .select("src", "dst").collect()
    cats = {}
    for r in by_cat:
        cats.setdefault(r["dst"], set()).add(r["src"])
    for cat, prods in cats.items():
        labels = {comp[p] for p in prods} | {comp[cat]}
        assert len(labels) == 1


def test_filter_vertices_induces_subgraph(graph):
    sub = graph.filter_vertices(F.col("label").isin("Order", "Product"))
    assert set(r["rel_type"] for r in
               sub.edges.select("rel_type").distinct().collect()) \
        == {"CONTAINS"}


def test_save_load_roundtrip(graph, spark, tmp_path):
    path = str(tmp_path / "pg")
    graph.save(path)
    back = PropertyGraph.load(spark, path)
    assert back.vertices.count() == graph.vertices.count()
    assert back.edges.count() == graph.edges.count()
    assert sorted(back.edges.columns) == sorted(graph.edges.columns)


def test_integrity_report_clean(graph):
    rep = {r["check"]: r["n_bad"] for r in graph.integrity_report().collect()}
    assert rep == {"duplicate_vertex_ids": 0,
                   "dangling_src": 0, "dangling_dst": 0}


def test_neighbor_agg_mean_feature(spark):
    """1-layer mean message passing on a 3-vertex path graph."""
    from graph_database_spark.graphs.traversal import neighbor_mean_agg
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"])
    feat = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40)], ["id", "order_count"])
    got = {r["id"]: (r["degree"], r["mean_neighbor_orders"])
           for r in neighbor_mean_agg(edges, feat, "order_count",
                                      "mean_neighbor_orders").collect()}
    assert got[1] == (1, 20.0)
    assert got[2] == (2, 25.0)   # mean(10, 40)
    assert got[3] == (1, 20.0)


def test_star_components_match_propagation_on_graph(graph):
    prop = {r["id"]: r["component"]
            for r in graph.connected_components().collect()}
    star = {r["id"]: r["component"]
            for r in graph.connected_components_star().collect()}
    assert star == prop


def test_api_weighted_paths_and_hits_shapes(graph, spark):
    lm = graph.vertices.select("id").orderBy("id").limit(1)
    wsp = graph.weighted_shortest_paths(lm, rounds=4)
    assert set(wsp.columns) == {"id", "landmark", "dist"}
    assert wsp.filter(F.col("dist") == 0.0).count() == 1  # the landmark
    h = graph.hits(max_iter=5, rel_type="CONTAINS").collect()
    sides = {r["side"] for r in h}
    assert sides == {"hub", "authority"}
    for side in sides:  # L1-normalized per side
        tot = sum(r["score"] for r in h if r["side"] == side)
        assert abs(tot - 1.0) < 1e-4


def test_cooccurrence_viz_edges_and_dot(spark):
    """Q9's engine half: widths land in the reference's 2..8 range with
    the max-count edge at exactly 8.0; the DOT export is deterministic,
    parses as a graph document, and declares truncation loudly."""
    from graph_database_spark.graphs.viz import (
        cooccurrence_viz_edges, display_graph, edges_to_dot,
    )
    from graph_database_spark.queries._shared import _items

    edges = cooccurrence_viz_edges(_items(spark, "/root/testdata/sf0.001"))
    rows = edges.collect()
    assert rows
    assert all(2.0 < r["width"] <= 8.0 for r in rows)
    assert any(r["width"] == 8.0 for r in rows)  # the max-count edge
    dot = edges_to_dot(edges, limit=10)
    assert dot.startswith('graph "cooccurrence" {')
    assert dot.rstrip().endswith("}")
    assert "truncated to top 10" in dot and dot.count(" -- ") == 10
    assert edges_to_dot(edges, limit=10) == dot  # deterministic
    full = edges_to_dot(edges, limit=len(rows))
    assert "truncated" not in full and full.count(" -- ") == len(rows)
    # a hostile graph name goes through the same escaper as node ids —
    # spaces, quotes, and DOT keywords must yield a valid quoted id
    hostile = edges_to_dot(edges, graph_name='my "graph" {strict}',
                           limit=1)
    assert hostile.startswith('graph "my \\"graph\\" {strict}" {')
    # rendering needs networkx/matplotlib (absent here) — same
    # ImportError contract as the reference
    import pytest
    with pytest.raises(ImportError):
        display_graph(edges)
