"""Relational analytics beyond the reference's operator set.

The reference delegates all heavy relational work to Postgres/Neo4j
(SURVEY §2.4 'Absent' rows); these are the standard OLAP shapes a user of
the engine needs at scale, expressed as single declarative plans so
Catalyst handles pushdown/pruning/partial-agg and AQE handles skew.

Double sums go through DECIMAL(18,4): exact, order-independent — safe for
distributed execution and for value-hash comparison with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dec_sum(col, scale: int = 4, out_round: int = 2):
    """Exact decimal sum of a double column, rounded and returned as double."""
    return F.round(
        F.sum(F.col(col).cast(f"decimal(18,{scale})")), out_round
    ).cast("double")


def _dec_expr_sum(expr, out_round: int = 2):
    return F.round(F.sum(expr.cast("decimal(27,8)")), out_round).cast("double")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: groupBy(returnflag, linestatus) with
    the classic aggregate battery. One hash aggregation, map-side partials."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", out_round=2).alias("sum_qty"),
            _dec_sum("l_extendedprice", out_round=2).alias("sum_base_price"),
            _dec_expr_sum(disc_price).alias("sum_disc_price"),
            _dec_expr_sum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Revenue per customer nation: lineitem ⋈ orders ⋈ customer ⋈ nation.

    nation (25 rows) and customer (small vs lineitem) broadcast; the only
    shuffle is lineitem⋈orders on the order key + the final groupBy, and at
    100 TB AQE converts the groupBy(25 keys) to a near-free partial agg.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.select("l_orderkey", revenue.alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dec_expr_sum(F.col("rev")).alias("revenue"))
    )


def top_parts_by_revenue(lineitem: DataFrame, n: int = 100) -> DataFrame:
    """Top-N parts by discounted revenue, deterministic tie-break."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .groupBy(F.col("l_partkey").alias("product_id"))
        .agg(_dec_expr_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("product_id"))
        .limit(n)
    )
