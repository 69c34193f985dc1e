"""Streaming/batch parity over the events fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.streaming.events_stream import (
    events_stream,
    run_stream_to_memory,
    sessionized_counts,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    assert stream.isStreaming
    result = run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="complete"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (r.hour, r.event_type): r.n_events for r in result.collect()
    }
    want = {(r.hour, r.event_type): r.n_events for r in batch.collect()}
    assert got == want
    assert sum(got.values()) == load_table(spark, sf_dir, "events").count()


def test_session_windows_run(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    result = run_stream_to_memory(
        sessionized_counts(stream), "sessions", output_mode="complete"
    )
    rows = result.collect()
    assert len(rows) > 0
    # session totals cover every event
    assert sum(r.n_events for r in rows) == load_table(
        spark, sf_dir, "events"
    ).count()
    assert all(r.session_start <= r.session_end for r in rows)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    from cassandra_analytics_spark.streaming.events_stream import (
        click_purchase_interval_join,
    )

    stream = events_stream(spark, sf_dir)
    result = run_stream_to_memory(
        click_purchase_interval_join(stream, stream),
        "cp_join",
        output_mode="append",
    )
    batch = load_table(spark, sf_dir, "events")
    want_df = click_purchase_interval_join(batch, batch)
    got = {(r.click_id, r.purchase_id) for r in result.collect()}
    want = {(r.click_id, r.purchase_id) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_dedup_matches_batch(spark, sf_dir):
    # feed every event twice (two unions of the same file stream — the
    # at-least-once replay case); the watermarked dedup must restore
    # exactly the batch-distinct row set
    from cassandra_analytics_spark.catalog import load_table
    from cassandra_analytics_spark.streaming.events_stream import (
        dedup_events_stream,
        events_stream,
        run_stream_to_memory,
    )

    s = events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    out = run_stream_to_memory(
        dedup_events_stream(doubled),
        "dedup_stream_test",
        output_mode="append",
    )
    batch = load_table(spark, sf_dir, "events")
    assert out.count() == batch.dropDuplicates(["event_id"]).count()
    # no duplicate survived
    assert out.select("event_id").distinct().count() == out.count()
