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
