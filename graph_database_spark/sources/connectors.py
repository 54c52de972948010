"""Source/sink connectors (SURVEY §2.1 S2/S3/S4).

Readers: parquet (the default — columnar, pushdown), CSV/JSON with
explicit schemas (never inferSchema in a pipeline), and JDBC with
partitioned reads — the Spark answer to the reference's six full-table
`pd.read_sql` scans into driver memory (tp2/app/etl.py:198-206): predicate
pushdown + column pruning reach the database, and `numPartitions` ×
partitionColumn bounds split the scan across executors instead of
marshaling everything through one connection.

Writers: the graph sink (S4) as partitioned parquet vertex/edge tables;
`save_as_table` covers the DDL surface (S3). Delta/Iceberg would slot in
here but their jars are not in this environment — the writer API is
format-parameterized so they are a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, **options) -> DataFrame:
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType,
              **options) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None,
              num_partitions: int = 8, **options) -> DataFrame:
    """Partitioned JDBC scan. Requires the JDBC driver jar on the
    classpath (not bundled here — raises at load() without it)."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  max_records_per_file: int | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_graph(vertices: DataFrame, edges: DataFrame, path: str,
                mode: str = "overwrite") -> dict[str, str]:
    """The graph sink (S4): vertex/edge parquet tables, edges partitioned
    by rel_type so per-relationship scans prune at the directory level —
    the columnar replacement for Neo4j's per-row MERGE round-trips."""
    vpath = os.path.join(path, "vertices")
    epath = os.path.join(path, "edges")
    write_parquet(vertices.repartition("label"), vpath, mode,
                  partition_by=["label"])
    write_parquet(edges.repartition("rel_type"), epath, mode,
                  partition_by=["rel_type"])
    return {"vertices": vpath, "edges": epath}


def read_graph(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return (spark.read.parquet(os.path.join(path, "vertices")),
            spark.read.parquet(os.path.join(path, "edges")))


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite",
                  bucket_by: tuple[int, str] | None = None) -> None:
    """DDL surface (S3): managed table; optional bucketing so later joins
    on the bucket key co-locate without a shuffle."""
    writer = df.write.mode(mode).format("parquet")
    if bucket_by is not None:
        n, col = bucket_by
        writer = writer.bucketBy(n, col).sortBy(col)
    writer.saveAsTable(name)


def healthcheck(spark: SparkSession) -> bool:
    """S7 analog: the session answers a trivial query
    (tp2/app/etl.py:59-105 readiness probes)."""
    try:
        return spark.sql("SELECT 1 AS ok").first()["ok"] == 1
    except Exception:
        return False


def read_orc(spark: SparkSession, path: str,
             schema: StructType | None = None, **options) -> DataFrame:
    """ORC reader (columnar sibling of parquet: same pushdown/pruning;
    Hive-ecosystem interchange format)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, **options) -> None:
    """CSV export (interchange only — no pushdown/pruning on re-read;
    never the storage format for pipeline state)."""
    df.write.mode(mode).options(header=header, **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               **options) -> None:
    df.write.mode(mode).options(**options).json(path)
