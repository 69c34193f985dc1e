"""Streaming pipelines over the events table.

Batch/stream parity: each streaming aggregation here has a batch twin in
``queries/relational.py`` (events_hourly_stats, events_sessionize); tests
assert the streaming result equals the batch result once the stream drains
— the Kappa-architecture check.

Scale posture: watermarks bound state; windowed aggs shuffle on
(window, key) which is high-cardinality; ``session_window`` uses Spark's
native session state store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the events fixture (schema from a batch
    probe; parquet nanos handled the same way as the batch source)."""
    from cassandra_analytics_spark.catalog import load_table, table_path

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # file-source streams need a directory/glob, not a bare file
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", sf_dir)
        .parquet(os.path.join(sf_dir, "events.parquet*"))
    )
    if dict(batch.dtypes)["ts"] == "timestamp":
        from pyspark.sql import types as T

        if isinstance(raw_schema["ts"].dataType, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    # Watermarks require TIMESTAMP (with local tz); parquet TIMESTAMP
    # without UTC adjustment arrives as TIMESTAMP_NTZ. The ntz→ltz cast
    # evaluates under the session timezone AT QUERY START. The UTC pin
    # itself is the CATALOG layer's documented contract —
    # catalog.load_table (used above for schema inference) sets
    # spark.sql.session.timeZone=UTC as part of source normalization, so
    # on every normal call path the session is already UTC here and this
    # check cannot fire. It exists as a backstop for the one remaining
    # hazard: a caller flipping the tz between building and starting the
    # stream (nothing in Spark can freeze the tz into the cast
    # expression itself), or constructing the stream without going
    # through the catalog. This function adds no tz mutation of its own.
    if dict(stream.dtypes)["ts"] == "timestamp_ntz":
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                "events_stream requires a UTC session "
                f"(spark.sql.session.timeZone={tz!r}): the ntz->timestamp "
                "cast evaluates under the session timezone at query start; "
                "set spark.sql.session.timeZone=UTC before building streams"
            )
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type with a watermark for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (the streaming twin of events_sessionize)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    max_gap_minutes: int = 30,
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks at most ``max_gap_minutes`` earlier.

    Both sides carry watermarks and the join condition bounds event time
    in both directions, so Spark can expire join state (unbounded
    stream-stream joins otherwise buffer forever). Scale posture: state is
    keyed on user_id (maximum-cardinality, uniform) and bounded to the
    interval width by the watermark — the 100 TB/day case holds as long
    as the gap stays a constant window.

    Batch twin: the identical join expression over the batch table (the
    condition compiles to an equi-join on user_id with a range residual).
    """
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return c.join(p, cond).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain the stream into an in-memory sink and return the result table
    (test/debug harness; production would writeStream to parquet/kafka)."""
    import tempfile

    spark = stream_df.sparkSession
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt-")
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint, query_name))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    # copy the drained rows out of the sink table, then release it: each
    # uuid-named invocation would otherwise pin its full result in driver
    # memory for the session lifetime (bench + driver + tests re-run
    # these queries many times per session)
    result = spark.sql(f"SELECT * FROM {query_name}").localCheckpoint(eager=True)
    spark.catalog.dropTempView(query_name)
    import shutil

    if checkpoint_dir is None:
        shutil.rmtree(checkpoint, ignore_errors=True)
    return result


def dedup_events_stream(
    stream: DataFrame,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
    until the watermark passes it, so state is bounded by (arrival rate x
    watermark) instead of growing with the whole stream — the property a
    100 TB/day ingest needs. Duplicates arriving within the watermark
    window of the first occurrence are dropped; rows are emitted
    immediately (append mode), not held until window close.

    Batch twin: ``dropDuplicates(keys)`` over the full table (streaming
    result equals batch exactly when all duplicates arrive inside the
    watermark, as in replay/at-least-once delivery).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
