"""Q9: co-occurrence graph visualization (ref tp1/knoledge_graphs/
graph.py:88-127), split Spark-first.

The reference's display_graph does two separable things: (1) derive the
undirected weighted co-occurrence graph and per-edge render widths
2 + 6·(count / max_count) — pure dataflow, and (2) hand it to
networkx spring-layout + matplotlib — a driver/human-scale rendering
step. Here (1) is a distributed operator with a DuckDB oracle
(`cooccurrence_viz_edges` in the registry), and (2) is `display_graph`
behind the same ImportError gate as the reference (those libraries are
not in this container), plus `edges_to_dot` — a dependency-free DOT
export any Graphviz renderer consumes. Visualization is inherently
bounded by what a human can look at, so the driver-side collects take
an explicit `limit` and surface truncation loudly in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.cooccurrence import cooccurrence_unordered


def cooccurrence_viz_edges(items: DataFrame) -> DataFrame:
    """(src, dst, co_count, width): the undirected co-occurrence graph
    exactly as the reference renders it — pairs counted once per order
    (src < dst, tp1's has_edge dedup), width = 2 + 6·(count/max_count)
    rounded to 6 dp (graph.py:118-119). One pair aggregate plus a 1-row
    broadcast max; no collect, any scale."""
    pairs = cooccurrence_unordered(items) \
        .withColumnRenamed("count", "co_count")
    mx = pairs.agg(F.max("co_count").alias("__mx"))
    # parenthesized 6·(count/max) — the oracle spells the identical IEEE
    # operation order, so ROUND(...,6) can never straddle a boundary
    # between engines (left-associated (6·count)/max differs by ulps)
    return (pairs.crossJoin(F.broadcast(mx))
            .select("src", "dst", "co_count",
                    F.round(F.lit(2.0) + F.lit(6.0)
                            * (F.col("co_count").cast("double")
                               / F.col("__mx").cast("double")), 6)
                    .alias("width")))


def edges_to_dot(edges: DataFrame, graph_name: str = "cooccurrence",
                 limit: int = 500) -> str:
    """Render (src, dst, ..., width) edges as a deterministic Graphviz
    DOT document (penwidth = the reference's edge width). Takes the
    top-`limit` edges by weight (deterministic tie-break) and says so in
    a comment when truncated — a render is driver-sized by definition,
    so the bound is explicit, not silent."""
    rows = (edges.orderBy(F.desc("width"), F.asc("src"), F.asc("dst"))
            .limit(limit + 1).collect())
    truncated = len(rows) > limit
    rows = rows[:limit]
    def _q(v) -> str:  # DOT double-quoted ID: escape \ and "
        s = str(v).replace("\\", "\\\\").replace('"', '\\"')
        return f'"{s}"'

    body = "\n".join(
        f'  {_q(r["src"])} -- {_q(r["dst"])} '
        f'[penwidth={r["width"]}, label={r["co_count"]}];'
        for r in rows)
    # the graph id goes through the same escaper as node ids — a name
    # with spaces/quotes/DOT keywords would otherwise break the document
    head = f"graph {_q(graph_name)} {{\n  node [shape=circle];\n"
    note = f"  // truncated to top {limit} edges by width\n" \
        if truncated else ""
    return head + note + body + "\n}\n"


def display_graph(edges: DataFrame, limit: int = 500):
    """The reference's spring-layout render, same ImportError contract
    (tp1 graph.py:96-100): requires networkx + matplotlib, which this
    container does not ship — `edges_to_dot` is the dependency-free
    path. Edge widths come in precomputed so the plot matches the
    reference's 2..8 range exactly."""
    try:
        import matplotlib.pyplot as plt
        import networkx as nx
    except ImportError as exc:
        raise ImportError(
            "To use display_graph, please install 'networkx' and "
            "'matplotlib'; edges_to_dot() renders without them."
        ) from exc
    rows = (edges.orderBy(F.desc("width"), F.asc("src"), F.asc("dst"))
            .limit(limit).collect())
    g = nx.Graph()
    for r in rows:
        g.add_edge(r["src"], r["dst"], weight=r["co_count"],
                   width=r["width"])
    pos = nx.spring_layout(g, seed=42)
    widths = [g[u][v]["width"] for u, v in g.edges()]
    plt.figure(figsize=(10, 8))
    nx.draw_networkx_nodes(g, pos, node_size=400, node_color="skyblue")
    nx.draw_networkx_edges(g, pos, width=widths, alpha=0.6)
    nx.draw_networkx_labels(g, pos, font_size=10, font_color="black")
    plt.title("Product Co-occurrence Graph")
    plt.axis("off")
    plt.tight_layout()
    plt.show()
