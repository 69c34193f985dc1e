"""Queries exercising the reference's own operators (SURVEY §2.1) over the
driver fixtures: LWW merge (M1), last-modified-timestamp (M5), partition-size
analytics (S3), token-range planning (M4/F2).

The ``events`` table plays the multi-version cell store: (user_id,
event_type) is the primary key, ``ts`` the write-timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.functions.tokens import token_column
from cassandra_analytics_spark.operators.merge import (
    last_modified_timestamp,
    latest_by_key,
)
from cassandra_analytics_spark.operators.partition_stats import partition_sizes
from cassandra_analytics_spark.queries import query
from cassandra_analytics_spark.queries._util import dsum_sql


@query(
    "lww_latest_events",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="M1 compaction-merge analog: last-write-wins row per primary key "
    "(CompactionStreamScanner.java:117-131 semantics, one window shuffle).",
)
def lww_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return latest_by_key(
        e, keys=["user_id", "event_type"], order_col="ts", tiebreakers=["event_id"]
    ).select("user_id", "event_type", "event_id", "ts", "value")


@query(
    "lww_partial_upsert",
    oracle="""
    SELECT user_id, event_type,
           arg_max(amount, event_id) FILTER (WHERE amount IS NOT NULL) AS amount,
           arg_max(tag, event_id) FILTER (WHERE tag IS NOT NULL) AS tag,
           MAX(event_id) AS wt
    FROM (
        SELECT user_id, event_type, event_id,
               CASE WHEN event_id % 3 <> 0 THEN value END AS amount,
               CASE WHEN event_id % 2 = 0
                    THEN event_type || '-' || CAST(event_id % 7 AS VARCHAR) END AS tag
        FROM events
    ) v
    GROUP BY user_id, event_type
    """,
    doc="M1 per-CELL last-write-wins (partial-row upserts): each version "
    "writes a subset of columns (NULL = not written); every column "
    "independently keeps its max-writetime cell, so an upsert that wrote "
    "only `tag` at t2 does not null out `amount` from t1 "
    "(SparkCellIterator.java:204-231, EndToEndTests.java:789,831). "
    "Physically a single hash aggregation of max_by — one shuffle with "
    "map-side combine; versions collapse before the exchange at 100 TB.",
)
def lww_partial_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_spark.operators.merge import compaction_merge

    e = load_table(spark, sf_dir, "events")
    # Derive a deterministic multi-version fixture: event_id is the unique
    # write-timestamp; each version writes `amount` only when id%3!=0 and
    # `tag` only when id%2==0 — partial upserts by construction.
    versions = e.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("wt"),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("amount"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat_ws("-", "event_type", (F.col("event_id") % 7).cast("string")),
        ).alias("tag"),
    )
    return compaction_merge(
        versions,
        partition_keys=["user_id"],
        clustering_keys=["event_type"],
        writetime_col="wt",
        ttl_col=None,
        tombstone_col=None,
        cell_lww=True,
        keep_writetime=True,
    )


@query(
    "lmt_last_modified",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           MAX(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id)
               AS last_modified_timestamp
    FROM events
    """,
    doc="M5 lastModifiedColumnName feature: max write-timestamp per partition "
    "appended as a column (LastModifiedTimestampDecorator.java:27-67).",
)
def lmt_last_modified(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return last_modified_timestamp(
        e, partition_keys=["user_id"], writetime_col="ts"
    ).select("event_id", "user_id", "ts", "last_modified_timestamp")


@query(
    "partition_size_orders",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(8 + 8 + strlen(o_orderstatus) + 8 + 8
                    + strlen(o_orderpriority)) AS BIGINT) AS uncompressed,
           CAST(FLOOR(SUM(8 + 8 + strlen(o_orderstatus) + 8 + 8
                          + strlen(o_orderpriority)) * 0.6) AS BIGINT)
               AS compressed,
           COUNT(*) AS row_count
    FROM orders
    GROUP BY o_custkey
    """,
    doc="S3 partition-size scan analog: per-partition byte sizes from column "
    "widths (PartitionSizeIterator.java:39-84, IndexReader.java:185-220).",
)
def partition_size_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return partition_sizes(o, partition_keys=["o_custkey"])


@query(
    "token_range_histogram",
    oracle=None,  # Spark-internal hash — no portable SQL equivalent
    doc="M4/F2 token-range planning analog: rows per token bucket; verifies "
    "the token partitioner spreads partitions uniformly "
    "(TokenPartitioner.java:76-120).",
)
def token_range_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tokens = token_column(F.col("o_custkey"))
    return (
        o.withColumn("bucket", F.pmod(tokens, F.lit(32)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("o_custkey").alias("n_partitions"))
    )


@query(
    "static_column_propagation",
    oracle="""
    SELECT o_orderkey, o_custkey,
           MAX(o_orderpriority) FILTER (WHERE o_orderpriority IS NOT NULL)
               OVER (PARTITION BY o_custkey) AS static_priority
    FROM orders
    """,
    doc="Static-column semantics demo (SparkCellIterator.java:282-287): one "
    "value per partition replicated onto every row. Uses max as the "
    "deterministic per-partition representative.",
)
def static_column_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.max("o_orderpriority").over(w).alias("static_priority"),
    )
