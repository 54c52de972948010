"""Physical-plan regression tests: the scale properties (column pruning,
filter pushdown, broadcast dimension joins, top-k) must survive refactors."""

from __future__ import annotations

import pytest

from graph_database_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_pricing_summary_prunes_columns(spark):
    plan = _formatted_plan(spark, "pricing_summary")
    read = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    # only the 6 referenced lineitem columns reach the scan (of 11)
    assert read.count(":") - 1 <= 6 + 1
    assert "l_orderkey" not in read and "l_shipdate" not in read


def test_cooccurrence_reads_two_columns(spark):
    plan = _formatted_plan(spark, "cooccurrence_topn")
    reads = [l for l in plan.split("\n") if "ReadSchema" in l]
    for r in reads:
        assert "l_orderkey" in r and "l_partkey" in r
        assert "l_extendedprice" not in r


def test_cooccurrence_topn_uses_topk_not_global_sort(spark):
    plan = _formatted_plan(spark, "cooccurrence_topn")
    assert "TakeOrderedAndProject" in plan


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _formatted_plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2


def test_focal_filter_pushed_to_scan(spark):
    plan = _formatted_plan(spark, "customer_cf")
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert any("o_custkey" in l and (
        "EqualTo" in l or "IsNotNull" in l) for l in pushed)


def test_seed_expansion_broadcasts_not_full_pairs(spark):
    """The seed pushdown must hold: no shuffle join of the full item table
    against itself — the seed side broadcasts (see
    seed_expansion_scores_from_items)."""
    plan = _formatted_plan(spark, "seed_expansion")
    assert "BroadcastHashJoin" in plan
    # the pair build would appear as a sort-merge self-join on order_id
    assert "SortMergeJoin" not in plan


def test_recommend_batch_broadcasts_neighbor_lists(spark):
    plan = _formatted_plan(spark, "recommend_batch")
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """S3 bucketing end-to-end: two tables bucketed on the join key join
    without an Exchange on either side — the co-located join the reference
    delegated to Postgres indexes."""
    from graph_database_spark.sources.connectors import save_as_table
    from graph_database_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey")
        items = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey")
        save_as_table(orders, "b_orders", bucket_by=(4, "o_orderkey"))
        save_as_table(items, "b_items", bucket_by=(4, "l_orderkey"))
        j = (spark.table("b_items")
             .join(spark.table("b_orders"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
