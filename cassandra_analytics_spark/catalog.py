"""Table catalog over the driver's parquet fixtures.

The reference obtains its table from a live cluster (Sidecar `schema()` →
CQL DDL → StructType, ``CassandraDataLayer.java:271,286``); here the
catalog's job is to expose the test parquet tables as named DataFrames /
temp views so every operator and query addresses tables by name, exactly
like the reference's ``keyspace.table`` addressing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so Catalyst
    gets full pushdown/pruning (SURVEY §2.1 P1/F1 analogs are free).

    Source-layer type normalization (the analog of the reference's CQL→Spark
    converters, SURVEY §1.3): parquet TIMESTAMP(NANOS) columns arrive as
    longs under ``nanosAsLong`` and are truncated to microsecond timestamps
    — the same floor-truncation DuckDB applies when casting TIMESTAMP_NS."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Defensive runtime confs: the caller may hand us a session that was
    # not built by our factory (e.g. the round driver's). Both are
    # runtime-settable SQL confs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # FLOOR division nanos→micros: `ts div 1000` truncates toward
            # zero, which rounds PRE-epoch timestamps the wrong way
            # (-1500 ns must floor to -2 µs, not -1) — subtracting the
            # nonnegative pmod remainder makes the div exact, staying in
            # long math (double division loses exactness past 2^53 ns ≈
            # 104 days). Post-epoch values are unchanged (round-8 pass).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet TIMESTAMP without UTC adjustment → NTZ; normalize to
            # TIMESTAMP (session tz is UTC above, so values are unchanged)
            # so event-time functions (unix_micros, watermarks) resolve.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES if
            os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
