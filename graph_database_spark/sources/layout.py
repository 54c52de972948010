"""Storage-layout optimization: range-clustered parquet writes.

At 100 TB the cheapest query is the one that never reads the data: parquet
row-group/file min-max statistics (zone maps) let a pushed-down predicate
skip whole files, but only if the writer CLUSTERED the data so each file
covers a narrow value range. The reference has no notion of storage layout
(its sink is one Neo4j round-trip per row, tp2/app/etl.py:223-329); this
module is the Spark-native replacement: `repartitionByRange` gives
disjoint per-file ranges, `sortWithinPartitions` tightens row-group stats
inside each file, and the plain parquet writer records the zone maps.

`zone_map`/`pruning_fraction` read the stats back via pyarrow so tests
(and operators) can assert layout quality instead of trusting it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_range_clustered(df: DataFrame, path: str, cluster_col: str,
                          num_files: int | None = None,
                          mode: str = "overwrite") -> None:
    """Write `df` as parquet clustered on `cluster_col`.

    repartitionByRange samples the column to build ~equal-size disjoint
    ranges (no driver-side histogram needed), so file k holds only rows
    with cluster_col in [lo_k, hi_k] and the file-level min/max stats
    become selective. A point or range predicate on cluster_col then
    touches O(1) of the files instead of all of them.
    """
    if num_files is not None:
        part = df.repartitionByRange(num_files, cluster_col)
    else:
        part = df.repartitionByRange(cluster_col)
    part.sortWithinPartitions(cluster_col).write.mode(mode).parquet(path)


def zorder_key(df: DataFrame, col_a: str, col_b: str,
               bits: int = 16) -> DataFrame:
    """Append `__zkey`: the Morton (Z-order) interleaving of the two
    columns' range-normalized bit patterns — the multi-dimensional
    clustering key (Delta/Iceberg's OPTIMIZE ZORDER idea) that makes
    zone maps selective on EITHER column, where single-column range
    clustering helps only its own column.

    Normalization scales (v - lo) into [0, 2^bits) via double division
    (overflow-safe for any long span; a layout key tolerates the last-ulp
    wobble), with lo/hi from one tiny aggregate broadcast into the plan
    (no driver sync). Interleaving is 2·bits shift/mask/or terms, all
    inside whole-stage codegen.
    """
    from pyspark.sql import functions as F

    rng = df.agg(
        F.min(col_a).alias("__alo"), F.max(col_a).alias("__ahi"),
        F.min(col_b).alias("__blo"), F.max(col_b).alias("__bhi"))
    top = (1 << bits) - 1

    def _norm(col: str, lo: str, hi: str):
        span = F.greatest(F.col(hi).cast("double") - F.col(lo).cast("double"),
                          F.lit(1.0))
        return ((F.col(col).cast("double") - F.col(lo).cast("double"))
                / span * top).cast("long")

    out = df.crossJoin(F.broadcast(rng))
    ka, kb = _norm(col_a, "__alo", "__ahi"), _norm(col_b, "__blo", "__bhi")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ka, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(kb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return out.withColumn("__zkey", z).drop("__alo", "__ahi",
                                            "__blo", "__bhi")


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   num_files: int | None = None, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Write `df` as parquet clustered on the Z-order key of two columns:
    each file covers a small square of the (col_a, col_b) value plane, so
    a predicate on either column alone — or both — skips most files. The
    key is dropped before writing; only the layout carries it."""
    keyed = zorder_key(df, col_a, col_b, bits)
    if num_files is not None:
        part = keyed.repartitionByRange(num_files, "__zkey")
    else:
        part = keyed.repartitionByRange("__zkey")
    (part.sortWithinPartitions("__zkey").drop("__zkey")
     .write.mode(mode).parquet(path))


def zone_map(path: str, col: str) -> list[tuple]:
    """[(file, min, max)] for `col` across the dataset's parquet files,
    from footer statistics only — no data pages are read."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return []  # stats absent → no pruning possible
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return out


def pruning_fraction(path: str, col: str, value) -> float:
    """Fraction of files a point predicate `col = value` can SKIP based on
    zone maps alone (1.0 = reads nothing, 0.0 = reads everything)."""
    zm = zone_map(path, col)
    if not zm:
        return 0.0
    hit = sum(1 for _, lo, hi in zm if lo <= value <= hi)
    return 1.0 - hit / len(zm)


def file_sizes(path: str) -> list[tuple[str, int]]:
    """[(relative_path, bytes)] for the dataset's parquet files, walking
    partitionBy subdirectories recursively — a flat listdir here would
    return [] for a hive-partitioned dataset and make compact_parquet
    size the rewrite from total=0 (everything into one file)."""
    out = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                full = os.path.join(root, n)
                out.append((os.path.relpath(full, path),
                            os.path.getsize(full)))
    return sorted(out)


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    cluster_col: str | None = None,
                    mode: str = "overwrite") -> int:
    """Rewrite a fragmented parquet dataset into ~target_bytes files;
    returns the file count written.

    The small-file problem is THE silent scan killer at 100 TB: a
    1000-executor job over a million 100 KB files pays a task per file
    (scheduling >> IO) and parquet footers stop fitting the driver. The
    file count is sized from the dataset's actual ON-DISK bytes (footer
    walk, no data read) — not row counts, which mispredict by the
    compression ratio. With `cluster_col` the rewrite goes through
    repartitionByRange + sortWithinPartitions, so compaction REPAIRS
    zone-map locality that accumulated small appends destroyed;
    without, a plain repartition balances bytes.
    """
    total = sum(b for _, b in file_sizes(src_path))
    n_files = max(1, -(-total // int(target_bytes)))
    df = spark.read.parquet(src_path)
    if cluster_col is not None:
        part = (df.repartitionByRange(n_files, cluster_col)
                .sortWithinPartitions(cluster_col))
    else:
        part = df.repartition(n_files)
    part.write.mode(mode).parquet(dst_path)
    return n_files


def write_embeddings_by_cell(embeddings: DataFrame, centroids,
                             path: str, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             mode: str = "overwrite") -> None:
    """IVF as STORAGE LAYOUT: hive-partition the embedding corpus by its
    1-NN centroid cell, so an nprobe-cell ANN query is answered by
    PARTITION PRUNING — the scan lists only the probed cells'
    directories and reads ~nprobe/nlist of the corpus bytes before any
    dot product runs. This is the data-skipping rung of the ANN ladder
    (above it: int8 quantization shrinks the bytes read; below it:
    in-memory IVF restricts compute). Cell assignment reuses the exact
    `ann._assign_cells` math of `cosine_topk_ivf`, so the storage layout
    and the query's probe decisions can never disagree.
    """
    from ..operators.ann import _assign_cells

    assign = _assign_cells(embeddings, centroids, 1, id_col, vec_col)
    (embeddings
     .join(assign.withColumnRenamed("id", id_col), id_col)
     .write.mode(mode).partitionBy("cell").parquet(path))


def read_probed_cells(spark, path: str, cells: list[int]) -> DataFrame:
    """Scan restricted to the probed cells. The predicate is on the
    partition column, so it resolves at planning time (PartitionFilters:
    unprobed directories are never listed, no row-level filter remains)
    — the test pins that plan shape."""
    from pyspark.sql import functions as F

    return (spark.read.parquet(path)
            .filter(F.col("cell").isin([int(c) for c in cells])))


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 32, sorted_within: bool = True,
                   mode: str = "overwrite") -> None:
    """Write `df` as a BUCKETED parquet table: rows are hash-partitioned
    into `num_buckets` files per write-task group on `bucket_col`, and
    the bucket spec is recorded in the catalog.

    This is the co-located-join rung of the storage ladder (above
    range/Z-order clustering, which serve scans): two tables bucketed on
    their join key with the same bucket count join with ZERO Exchange on
    either side — at 100 TB that deletes the dominant cost of every
    fact-to-fact join on a stable key (orders⋈customer, edges⋈vertices),
    paying the shuffle ONCE at write time and never again per query.
    Equality filters on the bucket column also prune to 1/num_buckets of
    the files at plan time (SelectedBucketsCount). `sorted_within`
    additionally sorts each bucket file so merge joins read presorted
    runs. Requires saveAsTable (the catalog carries the bucket spec;
    plain .parquet(path) cannot)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sorted_within:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)
