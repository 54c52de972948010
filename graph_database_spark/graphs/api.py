"""PropertyGraph — the unified graph-database surface over two DataFrames.

The reference exposes its graph through Neo4j (tp2: Cypher patterns over
nodes/relationships) and through tp1's in-memory projection
(tp1/knoledge_graphs/graph.py:19-33). This facade is the Spark-native
equivalent a user of either would reach for: ONE object holding the
vertex and edge DataFrames (GraphFrames convention: `id` / `src`,`dst`,
`rel_type`) with the graph operations of this engine hanging off it —
pattern matching (Cypher-shaped motifs), degrees, PageRank with the
reference's exact semantics, connected components, landmark BFS, and the
partitioned parquet sink/source.

Everything delegates to the operator modules; the facade adds no
execution machinery of its own — it exists so the *API surface* of a
graph database (schema + queries on one handle) is present, while every
operation stays a declarative DataFrame plan Catalyst optimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


class PropertyGraph:
    """vertices: (id, label, …properties); edges: (src, dst, rel_type, …)."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        self.vertices = vertices
        self.edges = edges

    # -- construction ------------------------------------------------------

    @classmethod
    def from_tables(cls, customers: DataFrame, categories: DataFrame,
                    products: DataFrame, orders: DataFrame,
                    order_items: DataFrame,
                    events: DataFrame | None = None) -> "PropertyGraph":
        """ETL-equivalent build (Q6): FK-validating joins, LWW event
        dedupe — one Spark job per edge type instead of per-row MERGE."""
        from .builder import build_edges, build_vertices
        return cls(
            build_vertices(customers, categories, products, orders),
            build_edges(products, categories, customers, orders,
                        order_items, events=events))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PropertyGraph":
        from ..sources.connectors import read_graph
        v, e = read_graph(spark, path)
        return cls(v, e)

    def save(self, path: str, mode: str = "overwrite") -> dict[str, str]:
        from ..sources.connectors import write_graph
        return write_graph(self.vertices, self.edges, path, mode)

    # -- subgraphs ---------------------------------------------------------

    def filter_vertices(self, predicate) -> "PropertyGraph":
        """Induced subgraph on vertices matching `predicate` (column or SQL
        string); edges restricted to surviving endpoints via semi-joins."""
        v = self.vertices.filter(predicate)
        ids = v.select("id")
        e = (self.edges
             .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
             .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi"))
        return PropertyGraph(v, e)

    def filter_edges(self, predicate) -> "PropertyGraph":
        return PropertyGraph(self.vertices, self.edges.filter(predicate))

    # -- queries -----------------------------------------------------------

    def find(self, pattern: str, allow_cartesian: bool = False) -> DataFrame:
        """Cypher-shaped motif match, e.g.
        '(p1)<-[:CONTAINS]-(o)-[:CONTAINS]->(p2)' (graphs/motif.py).
        Disconnected patterns raise unless allow_cartesian=True."""
        from .motif import find_motif
        return find_motif(self.edges, pattern, vertices=self.vertices,
                          allow_cartesian=allow_cartesian)

    def degrees(self, direction: str = "out",
                rel_type: str | None = None) -> DataFrame:
        """(id, degree) per vertex; direction ∈ {out, in, both}. Vertices
        with no edges report degree 0 (left join against the vertex set —
        the part Cypher's MATCH would silently drop)."""
        e = self.edges
        if rel_type is not None:
            e = e.filter(F.col("rel_type") == rel_type)
        sides = []
        if direction in ("out", "both"):
            sides.append(e.select(F.col("src").alias("id")))
        if direction in ("in", "both"):
            sides.append(e.select(F.col("dst").alias("id")))
        if not sides:
            raise ValueError(f"direction must be out/in/both: {direction}")
        ends = sides[0] if len(sides) == 1 else sides[0].unionAll(sides[1])
        deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
        return (self.vertices.select("id").join(deg, "id", "left")
                .select("id", F.coalesce("degree", F.lit(0)).alias("degree")))

    # -- algorithms --------------------------------------------------------

    def _projection(self, rel_type: str | None) -> DataFrame:
        """Row-stochastic (src, dst, weight) projection: uniform 1/outdeg
        unless the edge set already carries a `weight` column.

        Pre-existing weights are RE-normalized per src after any rel_type
        filter — weights normalized over all rel_types sum to < 1 on the
        filtered subgraph, and PageRank would silently leak that mass
        (vertices keeping some out-edges are not sinks, so nothing
        redistributes it).
        """
        e = self.edges
        if rel_type is not None:
            e = e.filter(F.col("rel_type") == rel_type)
        if "weight" in e.columns:
            w = Window.partitionBy("src")
            return e.select(
                "src", "dst",
                (F.col("weight") / F.sum("weight").over(w)).alias("weight"))
        from ..operators.cooccurrence import row_normalized_adjacency
        counted = e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("count"))
        return row_normalized_adjacency(counted, broadcast_row_sums=True)

    def page_rank(self, damping: float = 0.85, tol: float = 1e-6,
                  max_iter: int = 50, rel_type: str | None = None,
                  personalization: DataFrame | None = None,
                  init_ranks: DataFrame | None = None) -> DataFrame:
        """(id, rank) with tp1's exact semantics (uniform dangling
        redistribution, L1 convergence — graphs/pagerank.py).
        `init_ranks` warm-starts from a previous run's output — the
        incremental path after appending edges."""
        from .pagerank import pagerank
        return pagerank(self.vertices.select("id"),
                        self._projection(rel_type),
                        personalization=personalization, damping=damping,
                        tol=tol, max_iter=max_iter, init_ranks=init_ranks)

    def connected_components(self, rel_type: str | None = None,
                             max_iter: int = 50,
                             init_labels: DataFrame | None = None
                             ) -> DataFrame:
        """(id, component). init_labels warm-starts from a previous
        run's output after edge appends (the incremental path)."""
        from .traversal import connected_components
        e = self.edges if rel_type is None \
            else self.edges.filter(F.col("rel_type") == rel_type)
        return connected_components(self.vertices.select("id"),
                                    e.select("src", "dst"),
                                    max_iter=max_iter,
                                    init_labels=init_labels)

    def label_propagation(self, rel_type: str | None = None,
                          max_iter: int = 10) -> DataFrame:
        """(id, community) — deterministic synchronous LPA
        (graphs/traversal.label_propagation)."""
        from .traversal import label_propagation
        e = self.edges if rel_type is None \
            else self.edges.filter(F.col("rel_type") == rel_type)
        return label_propagation(self.vertices.select("id"),
                                 e.select("src", "dst"), max_iter=max_iter)

    def shortest_paths(self, landmarks: DataFrame, max_hops: int = 20,
                       rel_type: str | None = None) -> DataFrame:
        from .traversal import shortest_paths
        e = self.edges if rel_type is None \
            else self.edges.filter(F.col("rel_type") == rel_type)
        return shortest_paths(e.select("src", "dst"), landmarks,
                              max_hops=max_hops)

    def connected_components_star(self, rel_type: str | None = None,
                                  max_rounds: int = 30) -> DataFrame:
        """(id, component) by O(log n)-round star contraction — same
        answer as connected_components; prefer it when the diameter is
        unknown or large (graphs/traversal.connected_components_star)."""
        from .traversal import connected_components_star
        e = self.edges if rel_type is None \
            else self.edges.filter(F.col("rel_type") == rel_type)
        return connected_components_star(self.vertices.select("id"),
                                         e.select("src", "dst"),
                                         max_rounds=max_rounds)

    def weighted_shortest_paths(self, landmarks: DataFrame,
                                rounds: int = 8,
                                rel_type: str | None = None) -> DataFrame:
        """(id, landmark, dist): min-cost Bellman-Ford over edge weights
        (uniform 1/outdeg when the edge set carries none — the same
        projection page_rank walks)."""
        from .traversal import weighted_shortest_paths
        return weighted_shortest_paths(self._projection(rel_type),
                                       landmarks, rounds=rounds)

    def hits(self, max_iter: int = 10,
             rel_type: str | None = None) -> DataFrame:
        """(side, id, score): hubs & authorities over the directed edge
        set (graphs/hits.bipartite_hits; sides share the vertex space
        here, scores normalized per side)."""
        from .hits import bipartite_hits
        e = self.edges if rel_type is None \
            else self.edges.filter(F.col("rel_type") == rel_type)
        return bipartite_hits(e.select("src", "dst"), max_iter=max_iter)

    # -- integrity ---------------------------------------------------------

    def integrity_report(self) -> DataFrame:
        """(check, n_bad): duplicate vertex ids + dangling edge endpoints —
        the assertion layer replacing Neo4j's unique constraints
        (tp2/app/queries.cypher:2-9; SURVEY §4)."""
        ids = self.vertices.select("id")
        dup = (self.vertices.groupBy("id")
               .agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
               .agg(F.count(F.lit(1)).alias("n_bad"))
               .select(F.lit("duplicate_vertex_ids").alias("check"), "n_bad"))
        def dangling(col: str):
            return (self.edges
                    .join(ids.withColumnRenamed("id", col), col, "left_anti")
                    .agg(F.count(F.lit(1)).alias("n_bad"))
                    .select(F.lit(f"dangling_{col}").alias("check"), "n_bad"))
        return dup.unionByName(dangling("src")).unionByName(dangling("dst"))
