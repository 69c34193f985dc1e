"""Table maintenance: snapshot (as-of) reads and major compaction."""

from __future__ import annotations

import os

from pyspark.sql import Row

from cassandra_analytics_spark.sinks.bulk_writer import (
    WriteMode,
    bulk_write,
    committed_batches,
    compact_table,
    read_bulk_table,
)


def test_as_of_batch_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    r1 = bulk_write(
        spark.createDataFrame([Row(k=1, v="v1")]), path, ["k"],
        write_timestamp_micros=1_000,
    )
    batch1 = os.path.basename(r1.batch_dir)
    bulk_write(
        spark.createDataFrame([Row(k=1, v="v2")]), path, ["k"],
        write_timestamp_micros=2_000,
    )
    now = read_bulk_table(spark, path, ["k"]).collect()
    assert now[0].v == "v2"
    then = read_bulk_table(spark, path, ["k"], as_of_batch=batch1).collect()
    assert then[0].v == "v1"  # snapshot before the second commit


def test_compaction_preserves_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    bulk_write(
        spark.createDataFrame([Row(k=i, v=f"old{i}") for i in range(100)]),
        path, ["k"], write_timestamp_micros=1_000,
    )
    bulk_write(
        spark.createDataFrame([Row(k=i, v=f"new{i}") for i in range(0, 100, 2)]),
        path, ["k"], write_timestamp_micros=2_000,
    )
    bulk_write(
        spark.createDataFrame([Row(k=99)]), path, ["k"],
        mode=WriteMode.DELETE_PARTITION, write_timestamp_micros=3_000,
    )
    before = {r.k: r.v for r in read_bulk_table(spark, path, ["k"]).collect()}
    assert len(committed_batches(path)) == 3

    compact_table(spark, path, ["k"], num_partitions=2)
    assert len(committed_batches(path)) == 1  # old batches retired
    after = {r.k: r.v for r in read_bulk_table(spark, path, ["k"]).collect()}
    assert after == before
    assert 99 not in after and after[0] == "new0" and after[1] == "old1"

    # LWW still works after compaction: writetimes were preserved, so an
    # old-writetime write loses against compacted data
    bulk_write(
        spark.createDataFrame([Row(k=0, v="stale")]), path, ["k"],
        write_timestamp_micros=1_500,
    )
    assert {
        r.v for r in read_bulk_table(spark, path, ["k"]).filter("k=0").collect()
    } == {"new0"}
