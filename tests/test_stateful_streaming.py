"""applyInPandasWithState custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.streaming.events_stream import (
    events_stream,
    run_stream_to_memory,
)
from cassandra_analytics_spark.streaming.stateful import user_profiles


def test_user_profiles_match_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    result = run_stream_to_memory(
        user_profiles(stream), "profiles", output_mode="update"
    )
    # with update mode + single input file, one output row per user
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in result.collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    want = {r.user_id: (r.n, round(r.total, 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) < 1e-4
