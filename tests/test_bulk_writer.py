"""Bulk writer (W1-W4, S4/S5) round-trip: write → commit → read-merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from cassandra_analytics_spark.schema import parse_create_table
from cassandra_analytics_spark.sinks.bulk_writer import (
    BulkWriteError,
    WriteMode,
    bulk_write,
    committed_batches,
    read_bulk_table,
    verify_digests,
)


def _rows(spark, data):
    return spark.createDataFrame([Row(**d) for d in data])


def test_roundtrip_upsert_lww(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = _rows(spark, [
        {"id": 1, "ck": 1, "val": "one"},
        {"id": 2, "ck": 1, "val": "two"},
    ])
    r1 = bulk_write(v1, path, ["id"], ["ck"], write_timestamp_micros=1_000)
    assert r1.num_rows == 2 and os.path.exists(r1.manifest_path)

    v2 = _rows(spark, [{"id": 2, "ck": 1, "val": "two-updated"}])
    bulk_write(v2, path, ["id"], ["ck"], write_timestamp_micros=2_000)

    out = read_bulk_table(spark, path, ["id"], ["ck"])
    got = {(r.id, r.ck): r.val for r in out.collect()}
    assert got == {(1, 1): "one", (2, 1): "two-updated"}
    assert len(committed_batches(path)) == 2


def test_delete_partition_mode(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [
        {"id": 1, "ck": 1, "val": "a"},
        {"id": 1, "ck": 2, "val": "b"},
        {"id": 2, "ck": 1, "val": "c"},
    ])
    bulk_write(data, path, ["id"], ["ck"], write_timestamp_micros=1_000)
    deletes = spark.createDataFrame([Row(id=1)])
    bulk_write(
        deletes, path, ["id"], ["ck"],
        mode=WriteMode.DELETE_PARTITION, write_timestamp_micros=2_000,
    )
    out = read_bulk_table(spark, path, ["id"], ["ck"])
    got = {(r.id, r.ck): r.val for r in out.collect()}
    assert got == {(2, 1): "c"}


def test_digest_manifest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": i, "ck": 0, "val": f"v{i}"} for i in range(100)])
    result = bulk_write(data, path, ["id"], ["ck"], write_timestamp_micros=1)
    assert result.num_files >= 1
    assert verify_digests(result.batch_dir)
    # corrupt one file → digest check fails (disk-corruption test analog)
    files = [f for f in os.listdir(result.batch_dir) if f.endswith(".parquet")]
    with open(os.path.join(result.batch_dir, files[0]), "ab") as f:
        f.write(b"CORRUPT")
    assert not verify_digests(result.batch_dir)


def test_validation_missing_pk(spark, tmp_path):
    df = _rows(spark, [{"a": 1, "b": 2}])
    with pytest.raises(BulkWriteError, match="missing primary-key"):
        bulk_write(df, str(tmp_path / "t"), ["nope"])


def test_validation_extra_column_vs_table(spark, tmp_path):
    table = parse_create_table(
        "CREATE TABLE ks.t (id bigint PRIMARY KEY, course blob, marks bigint);"
    )
    df = _rows(spark, [{"id": 1, "marks": 10, "surprise": "x"}])
    with pytest.raises(BulkWriteError, match="not in table schema"):
        bulk_write(df, str(tmp_path / "t"), ["id"], table=table)


def test_overwrite_rejected(spark, tmp_path):
    df = _rows(spark, [{"id": 1}])
    with pytest.raises(BulkWriteError, match="append-only"):
        bulk_write(df, str(tmp_path / "t"), ["id"], save_mode="overwrite")


def test_ttl_expiry_on_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": 1, "val": "ephemeral"}])
    # writetime 1970 + 1s TTL → long expired
    bulk_write(data, path, ["id"], write_timestamp_micros=1_000_000, ttl_seconds=1)
    out = read_bulk_table(spark, path, ["id"])
    assert out.count() == 0


def test_sorted_within_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": i, "ck": i % 3, "val": str(i)} for i in range(500)])
    bulk_write(
        data, path, ["id"], ["ck"], write_timestamp_micros=1, num_partitions=4
    )
    batch = committed_batches(path)[0]
    import pyarrow.parquet as pq

    from cassandra_analytics_spark.functions.tokens import MIN_TOKEN
    for fname in os.listdir(batch):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(batch, fname))
        ids = tbl.column("id").to_pylist()
        # files are sorted by token; recompute tokens and check monotonicity
        import pyspark.sql.functions as F
        df = spark.createDataFrame([Row(id=i) for i in ids])
        toks = [
            r.t
            for r in df.coalesce(1).select(F.xxhash64("id").alias("t")).collect()
        ]
        assert toks == sorted(toks), f"file {fname} not token-sorted"
