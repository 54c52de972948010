"""Range-clustered parquet layout: zone maps must actually prune.

Writes the same lineitem slice twice — hash-shuffled (the layout a naive
`.repartition(n)` produces) and range-clustered on l_shipdate — and
asserts from parquet footer statistics that the clustered layout lets a
point predicate skip most files while the hash layout skips none. This is
the storage-side half of predicate pushdown: Catalyst pushes the filter,
but only the writer can make the zone maps selective.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.layout import (
    pruning_fraction, write_range_clustered, zone_map,
)
from graph_database_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 8


def test_range_clustering_prunes_hash_layout_does_not(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("l_shipdate"),
        "l_quantity")

    hashed = str(tmp_path / "hashed")
    clustered = str(tmp_path / "clustered")
    li.repartition(N_FILES).write.parquet(hashed)
    write_range_clustered(li, clustered, "l_shipdate", num_files=N_FILES)

    dates = sorted(r[0] for r in li.select("l_shipdate").distinct().collect())
    probe = dates[len(dates) // 2]  # median ship date, as a date object so
    # it compares cleanly against pyarrow's date32 footer statistics
    # a median-date point predicate: every hash file spans ~the full date
    # range (no pruning); the clustered layout confines it to ~1 file
    assert pruning_fraction(hashed, "l_shipdate", probe) == 0.0
    frac = pruning_fraction(clustered, "l_shipdate", probe)
    assert frac >= 0.6, f"clustered layout pruned only {frac:.2f}"

    # file ranges must be (near-)disjoint: total overlap pairs bounded
    zm = sorted(zone_map(clustered, "l_shipdate"), key=lambda t: t[1])
    overlaps = sum(1 for a, b in zip(zm, zm[1:]) if a[2] > b[1])
    assert overlaps == 0, f"adjacent file ranges overlap: {zm}"


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Single-column range clustering makes zone maps selective on its
    own column only; the Z-order layout must prune on EITHER column."""
    from graph_database_spark.sources.layout import write_zordered

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey")
    single = str(tmp_path / "single")
    zed = str(tmp_path / "zed")
    n_files = 16
    write_range_clustered(li, single, "l_partkey", num_files=n_files)
    write_zordered(li, zed, "l_partkey", "l_suppkey", num_files=n_files)

    pk = li.agg(F.expr("percentile_approx(l_partkey, 0.5)")).first()[0]
    sk = li.agg(F.expr("percentile_approx(l_suppkey, 0.5)")).first()[0]

    # partkey-clustered layout: selective on partkey, blind on suppkey
    assert pruning_fraction(single, "l_partkey", pk) >= 0.6
    assert pruning_fraction(single, "l_suppkey", sk) == 0.0
    # z-order: meaningfully selective on BOTH
    zp = pruning_fraction(zed, "l_partkey", pk)
    zs = pruning_fraction(zed, "l_suppkey", sk)
    assert zp >= 0.4, f"zorder pruned only {zp:.2f} on l_partkey"
    assert zs >= 0.4, f"zorder pruned only {zs:.2f} on l_suppkey"
    # and the layout key never leaks into the written schema
    import pyarrow.parquet as pq
    import os
    f = next(f for f in os.listdir(zed) if f.endswith(".parquet"))
    assert "__zkey" not in pq.read_schema(os.path.join(zed, f)).names


def test_clustered_read_roundtrip_and_filter(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("l_shipdate"),
        "l_quantity")
    path = str(tmp_path / "rt")
    write_range_clustered(li, path, "l_shipdate", num_files=N_FILES)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    d = li.select(F.max("l_shipdate")).first()[0]
    want = li.filter(F.col("l_shipdate") == d).count()
    assert back.filter(F.col("l_shipdate") == d).count() == want


def test_compaction_restores_file_count_and_locality(spark, tmp_path):
    """Simulated small-append fragmentation: many tiny files, each
    spanning the full key range (worthless zone maps). Compaction must
    hit the byte-derived file count and, with a cluster column, restore
    disjoint per-file ranges."""
    from graph_database_spark.sources.layout import (
        compact_parquet, file_sizes,
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("l_shipdate"),
        "l_quantity")
    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    # hash-partitioned tiny files = the accumulated-appends layout
    li.repartition(64).write.parquet(frag)
    sizes = file_sizes(frag)
    assert len(sizes) == 64
    total = sum(b for _, b in sizes)
    target = total // 6
    n = compact_parquet(spark, frag, compacted, target_bytes=target,
                        cluster_col="l_shipdate")
    got = file_sizes(compacted)
    assert len(got) == n <= 8
    # locality repaired: adjacent file ranges no longer overlap
    zm = sorted(zone_map(compacted, "l_shipdate"), key=lambda t: t[1])
    assert sum(1 for a, b in zip(zm, zm[1:]) if a[2] > b[1]) == 0
    # nothing lost
    assert spark.read.parquet(compacted).count() == li.count()
    # fragmented layout prunes nothing; compacted+clustered does
    dates = sorted(r[0] for r in li.select("l_shipdate").distinct().collect())
    probe = dates[len(dates) // 2]
    assert pruning_fraction(frag, "l_shipdate", probe) == 0.0
    assert pruning_fraction(compacted, "l_shipdate", probe) > 0.0


def test_file_sizes_walks_partitioned_datasets(spark, tmp_path):
    """file_sizes must see parquet files under partitionBy subdirectories;
    a flat listing returned [] and made compact_parquet size the rewrite
    from total=0."""
    from graph_database_spark.sources.layout import file_sizes

    part = str(tmp_path / "byregion")
    load_table(spark, SF_DIR, "nation").write.partitionBy(
        "n_regionkey").parquet(part)
    sizes = file_sizes(part)
    assert len(sizes) >= 5  # one or more files per region
    assert all(b > 0 for _, b in sizes)
    assert any("n_regionkey=" in name for name, _ in sizes)


def test_hive_partitioning_prunes_directories(spark, tmp_path):
    """Directory (hive-style) partitioning is the coarsest pruning lever
    at 100 TB: a filter on the partition column must surface as a
    PartitionFilter on the scan (directories never listed), not as a
    row-level PushedFilter evaluated after IO."""
    path = str(tmp_path / "by_type")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    got = (spark.read.parquet(path)
           .filter(F.col("event_type") == "purchase"))
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    pf = [l for l in plan.split("\n") if "PartitionFilters" in l]
    assert pf and "purchase" in pf[0], pf
    # the predicate is fully answered by pruning: no row-level pushed
    # filter on event_type remains (typically no PushedFilters line at all)
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert all("event_type" not in l for l in pushed), pushed
    # and the data actually matches
    n = got.count()
    assert n == ev.filter("event_type = 'purchase'").count() > 0


def test_ivf_cell_partitioned_embeddings_prune_at_plan_time(spark, tmp_path):
    """IVF as storage layout: a 2-of-8-cell probe resolves as a
    PartitionFilter (directories never listed, no row-level cell filter
    remains), reads exactly the cells' rows, and a top-k over the probed
    scan equals the same top-k over an in-memory cell restriction."""
    from pyspark.sql import functions as F

    from graph_database_spark.operators.ann import _assign_cells
    from graph_database_spark.sources.layout import (
        read_probed_cells, write_embeddings_by_cell,
    )
    from graph_database_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [list(r[0]) for r in
             emb.filter(F.col("vec_id") < 8).orderBy("vec_id")
                .select("embedding").collect()]
    path = str(tmp_path / "emb_by_cell")
    write_embeddings_by_cell(emb, cents, path)

    probed = read_probed_cells(spark, path, [1, 5])
    plan = probed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    pf = [l for l in plan.split("\n") if "PartitionFilters" in l]
    assert pf and any("cell" in l for l in pf), plan
    # the predicate fully resolves at planning time — no Filter node left
    assert "(2) Filter" not in plan and "* Filter" not in plan, plan

    want_ids = {r["id"] for r in
                _assign_cells(emb, cents, 1, "vec_id", "embedding")
                .filter(F.col("cell").isin([1, 5])).collect()}
    got = probed.collect()
    assert {r["vec_id"] for r in got} == want_ids and want_ids
    # partition value round-trips as the partition column
    assert {r["cell"] for r in got} == {1, 5}


def test_bucketed_tables_join_with_zero_exchange(spark):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with ZERO Exchange on either side (the
    write-once-shuffle-never-again contract), and an equality filter on
    the bucket column must prune to 1 of the buckets at plan time."""
    from graph_database_spark.sources.layout import write_bucketed

    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(cust, "t_cust_b", "c_custkey", num_buckets=8)
    write_bucketed(orders.withColumnRenamed("o_custkey", "c_custkey"),
                   "t_ord_b", "c_custkey", num_buckets=8)
    try:
        a = spark.table("t_cust_b")
        b = spark.table("t_ord_b")
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, "c_custkey").groupBy("c_mktsegment").count()
            plan = j._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            assert "SortMergeJoin" in plan
            # the ONLY Exchange node allowed is the final groupBy's —
            # an unbucketed SMJ would add one per join side (3 total)
            assert plan.count("+- Exchange") == 1, plan
            # correctness: same answer as the unbucketed join
            want = (cust.join(
                        orders.withColumnRenamed("o_custkey", "c_custkey"),
                        "c_custkey")
                    .groupBy("c_mktsegment").count())
            assert sorted(map(tuple, j.collect())) \
                == sorted(map(tuple, want.collect()))
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)

        # bucket pruning: equality on the bucket column hits 1/8 files.
        # For a bare filter (no join/agg to co-locate) the planner
        # prefers full-parallelism scans — turn auto-bucketed-scan off
        # to opt into pruning, as a point-lookup workload would.
        key = cust.select("c_custkey").head()[0]
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false")
        try:
            pruned = spark.table("t_cust_b") \
                .filter(F.col("c_custkey") == key)
            pplan = pruned._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            assert "SelectedBucketsCount: 1 out of 8" in pplan, pplan
        finally:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")
