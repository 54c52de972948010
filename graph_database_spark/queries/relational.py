"""Relational / OLAP queries over the TPC-H-ish tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..sources.testdata import load_table
from ..operators.analytics import (
    pricing_summary, revenue_by_nation, top_parts_by_revenue,
)
from ._shared import register

# ---------------------------------------------------------------------------
# OLAP battery (SURVEY §2.4 'Absent' rows made first-class)
# ---------------------------------------------------------------------------

@register("pricing_summary", """
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,8))), 2) AS DOUBLE) AS sum_charge,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register("revenue_by_nation", """
SELECT n.n_name,
  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


@register("top_parts_by_revenue", """
WITH r AS (
  SELECT l_partkey AS product_id,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS rev
  FROM lineitem GROUP BY l_partkey
)
SELECT product_id, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue
FROM r
ORDER BY rev DESC, product_id ASC
LIMIT 100
""")
def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_parts_by_revenue(load_table(spark, sf_dir, "lineitem"), 100)


# ---------------------------------------------------------------------------
# Event-stream analytics (batch twins of graph_database_spark.streaming)
# ---------------------------------------------------------------------------

@register("shipping_priority", """
SELECT l.l_orderkey AS order_id,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-06-01'
  AND l.l_shipdate > DATE '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate ASC, order_id ASC
LIMIT 10
""")
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment filter broadcast onto
    orders, date predicates pushed to both parquet scans, top-10 via
    TakeOrderedAndProject — the canonical fact-to-fact join with
    dimension pre-filter. Revenue decimal-summed (order-independent)."""
    cutoff = "1998-06-01"
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < F.lit(cutoff).cast("date"))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    items = (load_table(spark, sf_dir, "lineitem")
             .filter(F.col("l_shipdate") > F.lit(cutoff).cast("date"))
             .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        items.join(orders.join(F.broadcast(cust),
                               orders["o_custkey"] == cust["c_custkey"]),
                   items["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_orderkey").alias("order_id"),
                 "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("order_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Relational coverage the reference lacks (SURVEY §2.4/§2.5/§2.7 'Absent'
# rows made first-class): rollup, pivot, ranking windows, as-of join,
# table-level set ops, uniqueness assertions.
# ---------------------------------------------------------------------------

@register("revenue_rollup", """
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""")
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
           ).cast("decimal(27,8)")
    joined = (
        l.select("l_orderkey", rev.alias("rev"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
        .select(F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
                F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
                "revenue")
    )


@register("order_priority_pivot", """
SELECT o_orderstatus,
  CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
  CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
  CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium,
  CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS not_specified,
  CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS low
FROM orders GROUP BY o_orderstatus
""")
def q_order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (o.groupBy("o_orderstatus")
           .pivot("o_orderpriority",
                  ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
           .count())
    renames = {"1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
               "4-NOT SPECIFIED": "not_specified", "5-LOW": "low"}
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{k}`"), F.lit(0)).alias(v)
          for k, v in renames.items()])


@register("customer_order_seq", """
SELECT o_custkey AS customer_id, o_orderkey AS order_id,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
  CAST(CAST(epoch(o_orderdate) AS BIGINT)
       - CAST(epoch(LAG(o_orderdate) OVER w) AS BIGINT) AS BIGINT) AS gap_seconds
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
def q_customer_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.row_number().over(w).cast("long").alias("seq"),
        (F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
         - F.lag(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
            .over(w)).alias("gap_seconds"),
    )


@register("parts_intersect_nations", """
SELECT DISTINCT l.l_partkey AS product_id
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 0
INTERSECT
SELECT DISTINCT l.l_partkey
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 1
""")
def q_parts_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    def nation_parts(nk: int) -> DataFrame:
        l = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        return (l.join(o, l["l_orderkey"] == o["o_orderkey"])
                .join(F.broadcast(c.filter(F.col("c_nationkey") == nk)),
                      o["o_custkey"] == c["c_custkey"])
                .select(F.col("l_partkey").alias("product_id")).distinct())
    return nation_parts(0).intersect(nation_parts(1))


@register("pk_violations", """
SELECT 'customer' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_violations
FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'part', CAST(COUNT(*) AS BIGINT)
FROM (SELECT p_partkey FROM part GROUP BY p_partkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT)
FROM (SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT)
FROM (SELECT l_orderkey, l_linenumber FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
""")
def q_pk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Neo4j-uniqueness-constraint replacement (queries.cypher:2-9) as a
    data-quality report: duplicate natural keys per table."""
    def viol(table: str, keys: list[str]) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        dupes = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") > 1))
        return dupes.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).alias("n_violations"))
    parts = [viol("customer", ["c_custkey"]), viol("orders", ["o_orderkey"]),
             viol("part", ["p_partkey"]), viol("events", ["event_id"]),
             viol("lineitem", ["l_orderkey", "l_linenumber"])]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Exact interpolated quantiles (SURVEY §2.4 'Absent': no quantiles in the
# reference; percentile_approx is the 100 TB drop-in, exact here because
# the oracle compares values).
# ---------------------------------------------------------------------------

@register("quantity_quantiles", """
SELECT l_returnflag,
  CAST(ROUND(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS p50,
  CAST(ROUND(quantile_cont(l_quantity, 0.9), 6) AS DOUBLE) AS p90,
  CAST(ROUND(quantile_cont(l_quantity, 0.99), 6) AS DOUBLE) AS p99
FROM lineitem GROUP BY l_returnflag
""")
def q_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
                 F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
                 F.round(F.percentile("l_quantity", F.lit(0.99)), 6).alias("p99")))


# ---------------------------------------------------------------------------
# Wider relational coverage: supplier dimension, string functions, numeric
# binning, calendar rollups (SURVEY §2.8 'Absent' string/date functions).
# ---------------------------------------------------------------------------

@register("local_supplier_volume", """
SELECT n.n_name,
  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE s.s_nationkey = c.c_nationkey
GROUP BY n.n_name
""")
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from lineitems where the supplier and the
    ordering customer share a nation (supplier/nation broadcast)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
           ).cast("decimal(27,8)")
    return (
        l.select("l_orderkey", "l_suppkey", rev.alias("rev"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


@register("part_name_tokens", """
SELECT upper(substring(p_name, 1, 3)) AS prefix,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(ROUND(AVG(length(p_name)), 6) AS DOUBLE) AS avg_name_len,
  CAST(SUM(CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END) AS BIGINT) AS n_green
FROM part GROUP BY upper(substring(p_name, 1, 3))
""")
def q_part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery: substring/upper/length/LIKE."""
    p = load_table(spark, sf_dir, "part")
    prefix = F.upper(F.substring("p_name", 1, 3))
    return (p.groupBy(prefix.alias("prefix"))
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.round(F.avg(F.length("p_name")), 6).alias("avg_name_len"),
                 F.sum(F.when(F.col("p_name").like("%green%"), 1)
                        .otherwise(0)).alias("n_green")))


@register("orders_monthly_revenue", """
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mon,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM orders GROUP BY 1, 2
""")
def q_orders_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: year/month extraction over order timestamps."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mon"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
                  .cast("double").alias("revenue")))


@register("orders_rolling_revenue", """
WITH monthly AS (
  SELECT n.n_name, year(o.o_orderdate) AS yr, month(o.o_orderdate) AS mon,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3
)
SELECT n_name, CAST(yr AS INT) AS yr, CAST(mon AS INT) AS mon,
  CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
  CAST(ROUND(SUM(rev) OVER (PARTITION BY n_name ORDER BY yr, mon
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
       AS DOUBLE) AS rolling_rev
FROM monthly
""")
def q_orders_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import rolling_monthly_revenue
    return rolling_monthly_revenue(load_table(spark, sf_dir, "orders"),
                                   load_table(spark, sf_dir, "customer"),
                                   load_table(spark, sf_dir, "nation"))


@register("revenue_grouping_sets", """
WITH j AS (
  SELECT r.r_name, n.n_name,
         CAST(o.o_totalprice AS DECIMAL(18,4)) AS price
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT r_name, n_name,
  CASE WHEN r_name IS NOT NULL THEN 'region'
       WHEN n_name IS NOT NULL THEN 'nation'
       ELSE 'total' END AS grp,
  CAST(ROUND(SUM(price), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM j GROUP BY GROUPING SETS ((r_name), (n_name), ())
""")
def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import revenue_grouping_sets
    return revenue_grouping_sets(spark,
                                 load_table(spark, sf_dir, "orders"),
                                 load_table(spark, sf_dir, "customer"),
                                 load_table(spark, sf_dir, "nation"),
                                 load_table(spark, sf_dir, "region"))


@register("supplier_balance_stats", """
WITH a AS (
  SELECT n.n_name, COUNT(*) AS n_suppliers,
         SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS s,
         SUM(CAST(CAST(s.s_acctbal AS DECIMAL(18,4))
                  * CAST(s.s_acctbal AS DECIMAL(18,4))
                  AS DECIMAL(38,8))) AS ss
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
  CAST(ROUND(CAST(s AS DOUBLE) / CAST(n_suppliers AS DOUBLE), 6) AS DOUBLE)
    AS avg_bal,
  CASE WHEN n_suppliers > 1 THEN
    CAST(ROUND((CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n_suppliers AS DOUBLE))
               / (CAST(n_suppliers AS DOUBLE) - 1.0), 6) AS DOUBLE)
  END AS var_bal
FROM a
""")
def q_supplier_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import balance_stats_by_nation
    return balance_stats_by_nation(load_table(spark, sf_dir, "supplier"),
                                   load_table(spark, sf_dir, "nation"))


@register("nation_revenue_share", """
WITH pn AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
  CAST(ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
       AS DOUBLE) AS region_share
FROM pn
""")
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import nation_revenue_share
    return nation_revenue_share(load_table(spark, sf_dir, "orders"),
                                load_table(spark, sf_dir, "customer"),
                                load_table(spark, sf_dir, "nation"),
                                load_table(spark, sf_dir, "region"))


@register("customers_inactive_since", """
SELECT c.c_custkey, c.c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
""")
def q_customers_inactive_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import customers_inactive_since
    return customers_inactive_since(load_table(spark, sf_dir, "customer"),
                                    load_table(spark, sf_dir, "orders"),
                                    "2000-01-01")


@register("customer_rfm", """
WITH mx AS (SELECT MAX(o_orderdate) AS m FROM orders)
SELECT o_custkey AS customer_id,
  CAST(date_diff('day', MAX(o_orderdate), (SELECT m FROM mx)) AS INT)
    AS recency_days,
  CAST(COUNT(*) AS BIGINT) AS frequency,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS monetary
FROM orders GROUP BY 1
""")
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import customer_rfm
    return customer_rfm(load_table(spark, sf_dir, "orders"))


@register("fk_orphans", """
SELECT 'lineitem.l_partkey' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem.l_orderkey', CAST(COUNT(*) AS BIGINT) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders.o_custkey', CAST(COUNT(*) AS BIGINT) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer.c_nationkey', CAST(COUNT(*) AS BIGINT) FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
""")
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import fk_orphan_report
    li = load_table(spark, sf_dir, "lineitem")
    return fk_orphan_report([
        ("lineitem.l_partkey", li, "l_partkey",
         load_table(spark, sf_dir, "part"), "p_partkey"),
        ("lineitem.l_orderkey", li, "l_orderkey",
         load_table(spark, sf_dir, "orders"), "o_orderkey", False),
        ("orders.o_custkey", load_table(spark, sf_dir, "orders"), "o_custkey",
         load_table(spark, sf_dir, "customer"), "c_custkey"),
        ("customer.c_nationkey", load_table(spark, sf_dir, "customer"),
         "c_nationkey", load_table(spark, sf_dir, "nation"), "n_nationkey"),
    ])


@register("customer_value_deciles", """
WITH m AS (
  SELECT o_custkey AS customer_id,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
  FROM orders GROUP BY 1
),
d AS (
  SELECT customer_id,
         NTILE(10) OVER (ORDER BY mon DESC, customer_id ASC) AS decile,
         mon
  FROM m
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(mon), 2) AS DOUBLE) AS revenue
FROM d GROUP BY 1
""")
def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE ranking battery: customers bucketed into spend deciles.
    The total ordering key (monetary desc, customer_id) is unique, so
    bucket assignment is deterministic in both engines. The window runs
    over the per-customer aggregate (|customers| rows), never the fact
    table; the single-partition window is fine exactly because the
    aggregate is dimension-sized — at a fact-sized population you'd
    switch to approx quantile cutpoints and a broadcast range join."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window
    m = (o.groupBy(F.col("o_custkey").alias("customer_id"))
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
               .alias("mon")))
    w = Window.orderBy(F.desc("mon"), F.asc("customer_id"))
    d = m.select("customer_id", "mon", F.ntile(10).over(w).alias("decile"))
    return (d.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("mon"), 2).cast("double").alias("revenue")))


@register("order_baskets", """
SELECT l_orderkey AS order_id,
       CAST(COUNT(DISTINCT l_partkey) AS INT) AS basket_size,
       array_to_string(list_sort(list(DISTINCT CAST(l_partkey AS VARCHAR))),
                       ',') AS basket
FROM lineitem GROUP BY 1
""")
def q_order_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery: per-order basket as a sorted product-id
    list (collect_set → sort_array → concat_ws). The serialized-string
    form keeps the oracle comparison engine-portable; the array column
    itself is the input shape for basket-analysis/FP-growth style work.
    NOTE sort is lexicographic on the string ids in BOTH engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy(F.col("l_orderkey").alias("order_id"))
            .agg(F.countDistinct("l_partkey").cast("int")
                  .alias("basket_size"),
                 F.concat_ws(",", F.sort_array(
                     F.collect_set(F.col("l_partkey").cast("string"))))
                  .alias("basket")))


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderdate", "o_orderpriority")

_SQL_PROFILE_ONE = """
SELECT '{c}' AS col_name, n.n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_value,
  CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders CROSS JOIN n GROUP BY n.n_rows
"""


@register("orders_profile",
          "WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)\n"
          + "\nUNION ALL\n".join(
              _SQL_PROFILE_ONE.format(c=c) for c in _PROFILE_COLS))
def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table statistics: one row per profiled column with
    null count, exact distinct count, and typed min/max — computed in a
    single scan + one wide aggregate (the oracle needs a per-column
    UNION ALL to express the same answer)."""
    from ..operators.relational_ext import table_profile
    orders = load_table(spark, sf_dir, "orders")
    return table_profile(orders, list(_PROFILE_COLS))


@register("part_recency_popularity", """
WITH anchor AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS a FROM orders),
w AS (SELECT [CAST('1' AS DECIMAL(13,12)), CAST('0.5' AS DECIMAL(13,12)),
  CAST('0.25' AS DECIMAL(13,12)), CAST('0.125' AS DECIMAL(13,12)),
  CAST('0.0625' AS DECIMAL(13,12)), CAST('0.03125' AS DECIMAL(13,12)),
  CAST('0.015625' AS DECIMAL(13,12)), CAST('0.0078125' AS DECIMAL(13,12)),
  CAST('0.00390625' AS DECIMAL(13,12)), CAST('0.001953125' AS DECIMAL(13,12)),
  CAST('0.0009765625' AS DECIMAL(13,12)),
  CAST('0.00048828125' AS DECIMAL(13,12)),
  CAST('0.000244140625' AS DECIMAL(13,12))] AS tab),
rows_w AS (
  SELECT l.l_partkey AS product_id,
    CAST(l.l_quantity AS DECIMAL(12,2))
      * w.tab[CAST(LEAST(FLOOR(CAST(date_diff('day',
          CAST(o.o_orderdate AS DATE), anchor.a) AS DOUBLE) / 30), 12)
          AS INT) + 1] AS wq
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  CROSS JOIN anchor CROSS JOIN w)
SELECT product_id, CAST(COUNT(*) AS BIGINT) AS n_items,
  ROUND(CAST(SUM(wq) AS DOUBLE), 6) AS recency_score
FROM rows_w GROUP BY product_id
""")
def q_part_recency_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed popularity (recsys freshness signal the reference's
    popularity stubs lack): each elapsed 30 days halves an item's
    contribution, via an exact dyadic DECIMAL weight table — no pow(), no
    float-sum order sensitivity, so the score is bit-identical across
    engines and under any AQE re-partitioning."""
    from ..operators.popularity import recency_decayed_popularity
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").alias("quantity"))
    return recency_decayed_popularity(
        load_table(spark, sf_dir, "orders"), li)


@register("training_negatives", """
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS customer_id, l.l_partkey AS product_id
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
nn AS (SELECT COUNT(*) AS n FROM part),
ranked AS (
  SELECT p_partkey AS product_id,
         ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS pos
  FROM part),
draws AS (
  SELECT customer_id, i AS draw,
         CAST(('0x' || substr(md5(CAST(customer_id AS VARCHAR)
                                  || '#' || CAST(i AS VARCHAR)), 1, 15))
              AS BIGINT) % (SELECT n FROM nn) AS pos
  FROM (SELECT DISTINCT customer_id FROM pos) u,
       unnest(generate_series(1, 3)) AS g(i))
SELECT d.customer_id, r.product_id, CAST(d.draw AS INT) AS draw
FROM draws d JOIN ranked r USING (pos)
LEFT JOIN pos p ON p.customer_id = d.customer_id
               AND p.product_id = r.product_id
WHERE p.customer_id IS NULL
""")
def q_training_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over the purchase interactions —
    the contrastive/recommender training-data primitive (BPR, two-tower
    recsys): 3 hash-drawn catalog items per customer, positives dropped
    rather than re-drawn (the uniform-sampling contract; expected loss
    per draw is |positives|/|catalog|). The hash draw makes the sample
    layout-independent and exactly oracle-replayable where rand() would
    re-deal per partitioning; the catalog rank window is dimension-sized
    and broadcasts into the draw join."""
    from ..operators.sampling import negative_samples
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    pos = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .select(F.col("o_custkey").alias("customer_id"),
                   F.col("l_partkey").alias("product_id"))
           .distinct())
    cat = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"))
    return negative_samples(pos, cat, k=3)
