"""The documented 100 TB drop-ins for exact operators: approximate
count-distinct (HLL) and approximate percentiles. The registry keeps the
exact forms (the oracle hashes values); these tests pin that the approx
forms stay within their advertised error against the exact answers on
the driver data, so swapping them in at scale is a config change, not a
leap of faith."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = (li.groupBy("l_partkey")
             .agg(F.countDistinct("l_orderkey").alias("e")))
    approx = (li.groupBy("l_partkey")
              .agg(F.approx_count_distinct("l_orderkey", rsd=0.05)
                    .alias("a")))
    j = exact.join(approx, "l_partkey").collect()
    assert j
    bad = [r for r in j if abs(r["a"] - r["e"]) > max(3, 0.15 * r["e"])]
    # 5% rsd ⇒ errors beyond 3σ should be essentially absent
    assert len(bad) <= max(1, len(j) // 100), bad[:5]


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    rows = (li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
                 F.percentile_approx("l_quantity", 0.5, 10000)
                  .alias("approx_p50"))
            .collect())
    assert rows
    for r in rows:
        # at accuracy=10000 the approx median lands within 1 quantity unit
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 1.0, r
