"""Typed loaders for the driver-generated parquet testdata (TESTDATA.md).

Replaces the reference's full-table JDBC scans (SURVEY §2.1 S2,
tp2/app/etl.py:198-206 — six `SELECT *` into driver-side pandas) with lazy
columnar scans: `spark.read.parquet` keeps data distributed, and Catalyst
prunes columns/pushes predicates into the scan, which the reference's
pandas extract fundamentally could not do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts has shipped in two vintages: parquet TIMESTAMP(NANOS)
    (which Spark only reads as int64 under the nanosAsLong legacy flag)
    and plain timestamp[us]. Branch on the observed dtype so both work.
    """
    try:
        df = spark.read.parquet(path)
    except Exception:
        # nanos vintage without the flag: retry with nanosAsLong, restoring
        # the previous session setting afterwards.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer `div`, not `/`: int64 nanos exceed double's 53-bit mantissa
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        # normalize to session-local TIMESTAMP so downstream date/window fns
        # behave identically across vintages
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so spark.sql() can address them
    with the same names the DuckDB oracle uses."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
