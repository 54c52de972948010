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
