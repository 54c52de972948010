"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that is implemented gets an entry here;
`__spark_entry__.queries()` / `oracle_sql()` re-export these dicts. Each
Spark callable takes (spark, sf_dir) and returns a DataFrame over the
driver testdata tables (TESTDATA.md); the oracle is ANSI SQL DuckDB runs
on the same parquet.

Hash-stability conventions (the driver compares row-count + schema +
order-insensitive value-hash):
- integer aggregates: CAST to BIGINT in SQL (DuckDB SUM(BIGINT)→HUGEINT).
- double sums over data columns: sum DECIMAL(18,4) (exact, order-free)
  then ROUND + CAST AS DOUBLE on both sides.
- ratios: integer-derived doubles rounded to 6dp on both sides.
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources.testdata import load_table
from .operators.cooccurrence import (
    cooccurrence_ordered,
    cooccurrence_top_partners,
    cooccurrence_unordered,
    row_normalized_adjacency,
)
from .operators.incidence import incidence_pairs
from .operators.popularity import distinct_reach, order_frequency
from .operators.weights import EVENT_WEIGHTS_DRIVER, event_weights

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem in the reference's order_items role (FIXTURES.md §4):
    l_orderkey→order_id, l_partkey→product_id."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
    )


def _order_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer_id, product_id) pairs from orders ⋈ lineitem.

    The FK join is broadcast-friendly only for tiny dims; orders is not
    tiny, so this is a shuffled equi-join on the order key — co-partitioned
    with the co-occurrence self-join when both run in one plan.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
    )
    return _items(spark, sf_dir).join(orders, "order_id").select(
        "customer_id", "product_id")


# --- SQL fragment shared by co-occurrence oracles: enforce the reference's
# PK(order_id, product_id) invariant (01_schema.sql:25-30) on lineitem.
_SQL_ITEMS = "SELECT DISTINCT l_orderkey AS order_id, l_partkey AS product_id FROM lineitem"


# ---------------------------------------------------------------------------
# J2/W1: flagship — global co-occurrence top partners (tp2/app/main.py:92-123)
# ---------------------------------------------------------------------------

@register("cooccurrence_topn", f"""
WITH base AS ({_SQL_ITEMS})
SELECT b.product_id AS product_id, CAST(COUNT(*) AS BIGINT) AS co_count
FROM base a JOIN base b
  ON a.order_id = b.order_id AND a.product_id <> b.product_id
GROUP BY b.product_id
ORDER BY co_count DESC, product_id ASC
LIMIT 25
""")
def q_cooccurrence_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cooccurrence_top_partners(_items(spark, sf_dir), 25)


# ---------------------------------------------------------------------------
# J1/A1: unordered pair counts (tp1/knoledge_graphs/graph.py:55-62)
# ---------------------------------------------------------------------------

@register("cooccurrence_pairs", f"""
WITH base AS ({_SQL_ITEMS})
SELECT a.product_id AS src, b.product_id AS dst, CAST(COUNT(*) AS BIGINT) AS pair_count
FROM base a JOIN base b
  ON a.order_id = b.order_id AND a.product_id < b.product_id
GROUP BY a.product_id, b.product_id
""")
def q_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (cooccurrence_unordered(_items(spark, sf_dir))
            .withColumnRenamed("count", "pair_count"))


# ---------------------------------------------------------------------------
# A6: row-normalized adjacency (tp1/knoledge_graphs/graph.py:70-77)
# ---------------------------------------------------------------------------

@register("adjacency_row_norm", f"""
WITH base AS ({_SQL_ITEMS}),
pairs AS (
  SELECT a.product_id AS src, b.product_id AS dst, COUNT(*) AS cnt
  FROM base a JOIN base b
    ON a.order_id = b.order_id AND a.product_id <> b.product_id
  GROUP BY 1, 2
)
SELECT src, dst,
       CAST(ROUND(CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE), 6) AS DOUBLE) AS weight
FROM pairs
""")
def q_adjacency_row_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered pairs == the symmetric store of unordered pairs (graph.py:61-62)
    pairs = cooccurrence_ordered(_items(spark, sf_dir))
    adj = row_normalized_adjacency(pairs)
    return adj.select("src", "dst", F.round("weight", 6).alias("weight"))


# ---------------------------------------------------------------------------
# P6+A2: event weights (tp1/knoledge_graphs/graph.py:12-16,64-68)
# Driver events have no product_id; the group key is user_id (FIXTURES §4).
# ---------------------------------------------------------------------------

@register("event_weights_by_user", """
SELECT user_id,
       CAST(SUM(CASE event_type
                WHEN 'view' THEN 0.5 WHEN 'click' THEN 1.0
                WHEN 'purchase' THEN 2.0 ELSE 0.0 END) AS DOUBLE) AS weight
FROM events GROUP BY user_id
""")
def q_event_weights_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return event_weights(ev, group_cols=("user_id",),
                         weights=EVENT_WEIGHTS_DRIVER)


# ---------------------------------------------------------------------------
# SE1/A3: incidence pairs (tp1/knoledge_graphs/graph.py:55-66)
# ---------------------------------------------------------------------------

@register("incidence_pairs", """
SELECT DISTINCT o.o_custkey AS customer_id, l.l_partkey AS product_id
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""")
def q_incidence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incidence_pairs(_order_customer_pairs(spark, sf_dir))


# ---------------------------------------------------------------------------
# A4: distinct-customer reach (tp2/app/main.py:134-141)
# ---------------------------------------------------------------------------

@register("distinct_reach", """
SELECT l.l_partkey AS product_id,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS reach
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_partkey
""")
def q_distinct_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_reach(_order_customer_pairs(spark, sf_dir))


# ---------------------------------------------------------------------------
# A5: order-frequency popularity — tp2's pagerank stub (tp2/app/main.py:181-187)
# ---------------------------------------------------------------------------

@register("order_frequency", f"""
WITH base AS ({_SQL_ITEMS})
SELECT product_id, CAST(COUNT(*) AS BIGINT) AS order_count
FROM base GROUP BY product_id
""")
def q_order_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_frequency(_items(spark, sf_dir))
