"""Salted join equivalence + spread behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.util import salted_join, spread


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in (["hot"] * 3 + ["cold"])],
        ["k", "v"])
    right = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], ["k", "w"])
    plain = sorted((r["k"], r["v"], r["w"])
                   for r in left.join(right, "k").collect())
    salted = sorted((r["k"], r["v"], r["w"])
                    for r in salted_join(left, right, "k", salt=4).collect())
    assert salted == plain
    assert len(salted) == 800  # hot keys keep their multiplicity


def test_spread_widens_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["x"]).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = spread(df, 8)
    assert wide.rdd.getNumPartitions() == 8
    assert wide.count() == 100
