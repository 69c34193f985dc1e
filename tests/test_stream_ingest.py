"""Streaming ingestion into the bulk-table format (foreachBatch →
bulk_write → merge-on-read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.sinks.bulk_writer import (
    committed_batches,
    read_bulk_table,
)
from cassandra_analytics_spark.streaming.events_stream import events_stream
from cassandra_analytics_spark.streaming.ingest import stream_bulk_ingest


def test_stream_bulk_ingest_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_tbl")
    stream = events_stream(spark, sf_dir)
    q = stream_bulk_ingest(
        stream,
        path,
        partition_keys=["event_id"],
        writetime_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    assert len(committed_batches(path)) >= 1
    out = read_bulk_table(spark, path, ["event_id"])
    n_src = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_src  # unique event ids → merge is identity
    # writetime carries event time (micros)
    sample = out.limit(0)
    assert "event_id" in out.columns


def test_stream_ingest_lww_across_batches(spark, tmp_path):
    # two manual "micro-batches" with conflicting keys: later writetime wins
    from pyspark.sql import Row

    from cassandra_analytics_spark.sinks.bulk_writer import bulk_write

    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([Row(k=1, v="first", writetime=100)])
    b2 = spark.createDataFrame([Row(k=1, v="second", writetime=200)])
    bulk_write(b1, path, ["k"])
    bulk_write(b2, path, ["k"])
    out = read_bulk_table(spark, path, ["k"]).collect()
    assert len(out) == 1 and out[0].v == "second"


def test_stream_ingest_replay_reconciles_on_read(spark, tmp_path):
    """At-least-once replay of a micro-batch lands a SECOND committed
    batch dir with the same rows; the merge-on-read LWW must reconcile
    the duplicates so the table reads as if the batch landed once
    (round-7 interaction test: the ingest docstring claims this, nothing
    exercised a literal replay)."""
    import os

    from pyspark.sql import Row

    from cassandra_analytics_spark.sinks.bulk_writer import (
        bulk_write,
        read_bulk_table,
    )

    table = str(tmp_path / "tbl")
    rows = [Row(id=1, v="a", writetime=100), Row(id=2, v="b", writetime=100)]
    df = spark.createDataFrame(rows)
    # first attempt commits...
    bulk_write(df, table, ["id"])
    # ...crash before the checkpoint records the batch → foreachBatch
    # replays the SAME data as a new committed batch dir
    bulk_write(df, table, ["id"])
    batches = [d for d in os.listdir(table) if d.startswith("batch-")]
    assert len(batches) == 2  # both commits exist on disk
    got = {r.id: r.v for r in read_bulk_table(spark, table, ["id"]).collect()}
    assert got == {1: "a", 2: "b"}  # merge-on-read collapses the replay
