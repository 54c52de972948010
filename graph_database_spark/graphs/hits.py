"""HITS (hubs & authorities) on a bipartite interaction graph.

Beyond-reference graph algorithm in the same family as the reference's
PageRank (tp1/knoledge_graphs/recommendation.py:135-188 is the model for
the loop discipline): on the customer→product purchase graph, authority
ranks products by how much hub-weight buys them, hub ranks customers by
how authoritative their baskets are — the classic bipartite
reinforcement (Kleinberg, JACM 1999).

Execution mirrors graphs.pagerank: a driver loop over DataFrames, one
edge-join shuffle per half-step, L1 normalization riding along as a
1-row broadcast aggregate (no driver sync), lineage truncated per
iteration with localCheckpoint, state broadcast into the edge join under
the measured-size threshold. Fixed iteration count (no convergence
probe) keeps the whole fixed point replayable by an external engine —
the same contract as `pagerank(tol=-1)`, giving the DuckDB oracle a
value-level check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pagerank import _BROADCAST_STATE_ROWS, _iter_partitions


def bipartite_hits(edges: DataFrame, max_iter: int = 10,
                   num_partitions: int | None = None) -> DataFrame:
    """edges: (src, dst) distinct directed pairs (hub side → authority
    side; the two id spaces are independent). Returns (side, id, score):
    one 'hub' row per distinct src and one 'authority' row per distinct
    dst, both L1-normalized, scores rounded to 6 dp.

    Per iteration: a ← normalize₁(Aᵀ h), then h ← normalize₁(A a) — the
    in-iteration refresh of `a` (not the stale one) is Kleinberg's
    original update order. After the final h, one extra half-step
    derives the authorities consistent with it.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint()
    m = e.count()
    n_parts = num_partitions or _iter_partitions(
        edges.sparkSession.sparkContext, m)
    bcast = m <= _BROADCAST_STATE_ROWS
    if not bcast:
        e = e.repartition(n_parts, "src").localCheckpoint()

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    h = (e.select("src").distinct()
         .withColumn("h", F.lit(1.0)).localCheckpoint())

    def _authorities(hub: DataFrame) -> DataFrame:
        a = (e.join(_b(hub), "src")
             .groupBy("dst").agg(F.sum("h").alias("a")))
        tot = a.agg(F.sum("a").alias("__t"))
        return (a.crossJoin(F.broadcast(tot))
                .select("dst", (F.col("a") / F.col("__t")).alias("a")))

    for _ in range(max_iter):
        a = _authorities(h)
        h_new = (e.join(_b(a), "dst")
                 .groupBy("src").agg(F.sum("a").alias("h")))
        tot_h = h_new.agg(F.sum("h").alias("__t"))
        h = (h_new.crossJoin(F.broadcast(tot_h))
             .select("src", (F.col("h") / F.col("__t")).alias("h"))
             .localCheckpoint())

    a = _authorities(h)
    return (
        h.select(F.lit("hub").alias("side"), F.col("src").alias("id"),
                 F.round("h", 6).alias("score"))
        .unionByName(
            a.select(F.lit("authority").alias("side"),
                     F.col("dst").alias("id"),
                     F.round("a", 6).alias("score")))
    )
