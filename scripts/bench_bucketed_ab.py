"""A/B the write_bucketed claim where it matters: the sf1 fact-to-fact
join (lineitem ⋈ orders on orderkey, 6M × 1.5M rows) as a plain
sort-merge join vs the same join over bucketed tables.

The bucketed form must show ZERO Exchange before the final aggregate
(asserted on the plan, same pin as tests/test_layout.py) — the
write-once-shuffle-never-again contract. At 100 TB the per-query win
multiplies by every query that joins on the stable key; the one-time
bucketed write is the amortized cost and is reported separately.

Run after scripts/gen_sfbig.py:  python scripts/bench_bucketed_ab.py
Appends nothing; prints one JSON line for the SCALING.md appendix.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = "/tmp/sf1"
PASSES = 3
BUCKETS = 32


def _bench(df_fn, passes=PASSES):
    best = float("inf")
    for _ in range(passes):
        t = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t)
    return round(best, 2)


def main() -> None:
    from pyspark.sql import functions as F

    from graph_database_spark.session import get_spark
    from graph_database_spark.sources.layout import write_bucketed

    spark = get_spark("bucketed-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # force SMJ so the A arm measures the shuffle, not a 1.5M-row
    # broadcast the driver host happens to fit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    od = spark.read.parquet(f"{SF1}/orders.parquet")

    # per-ORDER rollup (1.5M groups): the realistic fact-to-fact shape
    # where the join AND the aggregation both key on the bucket column,
    # so bucketing deletes every Exchange in the plan — the plain form
    # shuffles all 6M lineitem rows + 1.5M orders rows per query
    def join_plain():
        return (li.join(od, li["l_orderkey"] == od["o_orderkey"])
                .groupBy("l_orderkey", "o_orderpriority")
                .agg(F.sum(F.col("l_extendedprice")
                           .cast("decimal(38,2)")).alias("rev"),
                     F.count(F.lit(1)).alias("n")))

    t_plain = _bench(join_plain)

    t0 = time.time()
    write_bucketed(li, "ab_li_b", "l_orderkey", num_buckets=BUCKETS)
    write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "ab_od_b", "l_orderkey", num_buckets=BUCKETS)
    t_write = round(time.time() - t0, 2)

    try:
        lib = spark.table("ab_li_b")
        odb = spark.table("ab_od_b")

        def join_bucketed():
            return (lib.join(odb, "l_orderkey")
                    .groupBy("l_orderkey", "o_orderpriority")
                    .agg(F.sum(F.col("l_extendedprice")
                               .cast("decimal(38,2)")).alias("rev"),
                         F.count(F.lit(1)).alias("n")))

        plan = join_bucketed()._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "SortMergeJoin" in plan
        n_exchanges = plan.count("+- Exchange")
        # join AND aggregate both key on the bucket column: the bucketed
        # plan has ZERO Exchange anywhere (the plain form plans one per
        # join side and reuses that partitioning for the agg)
        assert n_exchanges == 0, f"expected 0 Exchange, saw {n_exchanges}"

        t_bucketed = _bench(join_bucketed)

        a = sorted(map(tuple, join_plain().collect()))
        b = sorted(map(tuple, join_bucketed().collect()))
        assert a == b, "bucketed join answer drifted"
    finally:
        spark.sql("DROP TABLE IF EXISTS ab_li_b")
        spark.sql("DROP TABLE IF EXISTS ab_od_b")

    print(json.dumps({
        "workload": "sf1 lineitem⋈orders → per-order rollup (1.5M groups)",
        "plain_smj_sec": t_plain,
        "bucketed_sec": t_bucketed,
        "speedup": round(t_plain / t_bucketed, 2),
        "one_time_bucketed_write_sec": t_write,
        "exchanges_total": 0,
        "buckets": BUCKETS,
        "passes": PASSES,
    }))


if __name__ == "__main__":
    main()
