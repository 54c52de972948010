"""Iterative graph traversal: BFS shortest paths and connected components.

The reference's Neo4j backend gives its users Cypher path queries for
free; its own code only ships fixed 2-3 hop patterns (SURVEY §2.3). These
operators restore general traversal capability Spark-first: driver-side
loops over DataFrames, one equi-join shuffle per superstep, lineage
truncated with localCheckpoint — the same Pregel-on-DataFrames shape as
graphs.pagerank.

Scale notes: each superstep shuffles the frontier (BFS) or the full label
set (CC) against edges pre-partitioned on src. BFS work is proportional
to the expanding frontier; CC label propagation converges in O(diameter)
supersteps (the driver testdata co-occurrence graphs have tiny diameters;
for pathological chains the alternating small-star/large-star variant is
the drop-in upgrade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shortest_paths(edges: DataFrame, landmarks: DataFrame,
                   max_hops: int = 20,
                   num_partitions: int | None = None) -> DataFrame:
    """(id, landmark, dist): unweighted BFS distance from every reachable
    vertex to each landmark. edges: (src, dst) directed — pass a
    symmetric edge list for undirected semantics. landmarks: (id)."""
    n_parts = num_partitions or edges.sparkSession.sparkContext.defaultParallelism
    edges = edges.select("src", "dst").distinct() \
        .repartition(n_parts, "src").localCheckpoint()

    dist = landmarks.select(
        F.col("id"), F.col("id").alias("landmark"),
        F.lit(0).alias("dist")).localCheckpoint()
    frontier = dist

    for hop in range(1, max_hops + 1):
        # expand: neighbors of the frontier not yet seen for that landmark
        expanded = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"), "landmark",
                    F.lit(hop).alias("dist"))
            .distinct()
        )
        new_frontier = expanded.join(
            dist.select("id", "landmark"), ["id", "landmark"], "left_anti"
        ).localCheckpoint()
        if new_frontier.isEmpty():
            break
        dist = dist.unionByName(new_frontier).localCheckpoint()
        frontier = new_frontier
    return dist


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iter: int = 50,
                         num_partitions: int | None = None) -> DataFrame:
    """(id, component): undirected connected components by min-label
    propagation — component = smallest vertex id reachable. vertices: (id);
    edges: (src, dst), treated as undirected."""
    n_parts = num_partitions or edges.sparkSession.sparkContext.defaultParallelism
    sym = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
           .distinct()
           .repartition(n_parts, "src").localCheckpoint())

    labels = vertices.select("id", F.col("id").alias("component")) \
        .repartition(n_parts, "id").localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, labels["id"] == sym["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least(
                F.col("component"),
                F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"))
            .repartition(n_parts, "id")
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("component", "new_c")
            .join(labels, "id")
            .filter(F.col("new_c") != F.col("component"))
            .isEmpty()
        )
        labels = new_labels
        if changed:
            break
    return labels
