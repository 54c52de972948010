"""Product co-occurrence within orders.

Reference semantics (SURVEY §2.3 J1/J2, §2.4 A1/A6):

- tp1 counts each *unordered* pair once per order
  (tp1/knoledge_graphs/graph.py:55-62, itertools.combinations) and stores it
  symmetrically.
- tp2's Cypher counts *ordered* pairs — `(p1)<-[:CONTAINS]-(o)-[:CONTAINS]->(p2)
  WHERE p1 <> p2` (tp2/app/main.py:98-105) — same ranking, 2x counts.
- The reference's order_items PK(order_id, product_id) guarantees a product
  appears at most once per order (tp2/postgres/init/01_schema.sql:25-30);
  arbitrary item tables (e.g. the driver's lineitem) must be deduped first to
  preserve that invariant.

Spark-first design: a single self equi-join on the order key. Catalyst
plans a shuffled hash/sort-merge join partitioned by order_id; partial
aggregation (map-side combine) collapses pairs before the groupBy shuffle.
At 100 TB the only skew risk is a hot order (many items) — the join key is
order_id, so AQE skew-join splitting handles outlier orders; the pair-count
groupBy is on (src, dst), which is near-uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _item_pairs(items: DataFrame, order_col: str, product_col: str,
                cond: str) -> DataFrame:
    """Distinct (order, product) → joined product pairs within an order.

    `cond` is "<" for unordered pairs (count each pair once, tp1
    graph.py:60) or "!=" for ordered pairs (tp2 main.py:100).
    """
    base = items.select(
        F.col(order_col).alias("__order"),
        F.col(product_col).alias("__product"),
    ).distinct()  # enforce the PK(order_id, product_id) invariant
    a = base.alias("a")
    b = base.alias("b")
    comparison: Column = (
        F.col("a.__product") < F.col("b.__product") if cond == "<"
        else F.col("a.__product") != F.col("b.__product")
    )
    return (
        a.join(b, on=(F.col("a.__order") == F.col("b.__order")) & comparison)
        .select(F.col("a.__product").alias("src"), F.col("b.__product").alias("dst"))
    )


def cooccurrence_unordered(items: DataFrame, order_col: str = "order_id",
                           product_col: str = "product_id") -> DataFrame:
    """tp1-style co-occurrence: unordered pairs counted once per order.

    Returns (src, dst, count) with src < dst. The symmetric (stored both
    directions, graph.py:61-62) view is `symmetrize(...)`.
    """
    return (
        _item_pairs(items, order_col, product_col, "<")
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("count"))
    )


def symmetrize(pairs: DataFrame) -> DataFrame:
    """Mirror (src,dst,count) to both directions, as tp1 stores it
    (graph.py:61-62 increments both counters)."""
    mirrored = pairs.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "count")
    return pairs.unionByName(mirrored)


def cooccurrence_ordered(items: DataFrame, order_col: str = "order_id",
                         product_col: str = "product_id") -> DataFrame:
    """tp2-style co-occurrence: ordered pairs (p1 <> p2), 2x unordered counts.

    Cypher source: tp2/app/main.py:98-105.
    """
    return (
        _item_pairs(items, order_col, product_col, "!=")
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("count"))
    )


def cooccurrence_top_partners(items: DataFrame, n: int,
                              order_col: str = "order_id",
                              product_col: str = "product_id") -> DataFrame:
    """Global 'frequently bought together' top-N (tp2/app/main.py:92-123, Q3).

    groupBy partner product over ordered pairs, count, deterministic top-N.
    The reference's Cypher has nondeterministic ties (SURVEY §2.5 W2); we add
    the ascending product-id tie-break (W1, recommendation.py:231-240).
    Spark executes ORDER BY+LIMIT as TakeOrderedAndProject (top-k, no global
    sort) — the same optimization Neo4j applied server-side.
    """
    return (
        _item_pairs(items, order_col, product_col, "!=")
        .groupBy(F.col("dst").alias("product_id"))
        .agg(F.count(F.lit(1)).alias("co_count"))
        .orderBy(F.desc("co_count"), F.asc("product_id"))
        .limit(n)
    )


def row_normalized_adjacency(pairs: DataFrame,
                             broadcast_row_sums: bool = False) -> DataFrame:
    """Row-stochastic adjacency: weight = count / sum(count) over src.

    Reference: tp1/knoledge_graphs/graph.py:70-77 (SURVEY §2.4 A6). Input is
    the *symmetric* pair-count edge list; output (src, dst, weight) with
    weights per src summing to 1.

    Default shape: a single window partitioned by src — one shuffle of the
    full edge list. With `broadcast_row_sums=True` (caller declares the src
    dimension small, e.g. a product catalog vs. its quadratic pair table)
    the per-src sums are aggregated map-side to |src| rows and broadcast
    back — the edge list is never shuffled.
    """
    if broadcast_row_sums:
        sums = pairs.groupBy("src").agg(F.sum("count").alias("__row_sum"))
        return (
            pairs.join(F.broadcast(sums), "src")
            .select("src", "dst",
                    (F.col("count") / F.col("__row_sum")).alias("weight"))
        )
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    return pairs.select(
        "src", "dst",
        (F.col("count") / F.sum("count").over(w)).alias("weight"),
    )
