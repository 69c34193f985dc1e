"""Reference edge-case parity: collection clustering keys
(EndToEndTests.java:1881-1977), quoted/reserved identifiers (:2408-2537),
approx-distinct accuracy."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.sinks.bulk_writer import bulk_write, read_bulk_table


def test_array_clustering_key_roundtrip(spark, tmp_path):
    # collections as clustering keys are legal in the reference
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            Row(pk=1, ck=[1, 2], v="a"),
            Row(pk=1, ck=[1, 3], v="b"),
            Row(pk=2, ck=[9], v="c"),
        ]
    )
    bulk_write(df, path, ["pk"], ["ck"], write_timestamp_micros=1)
    out = read_bulk_table(spark, path, ["pk"], ["ck"])
    got = {(r.pk, tuple(r.ck)): r.v for r in out.collect()}
    assert got == {(1, (1, 2)): "a", (1, (1, 3)): "b", (2, (9,)): "c"}


def test_quoted_reserved_identifiers_roundtrip(spark, tmp_path):
    # case-preserving "Id"/"Value" and reserved word "select" as columns
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "x", 10), (2, "y", 20)], ["Id", "Value", "select"])
    bulk_write(df, path, ["Id"], write_timestamp_micros=1)
    out = read_bulk_table(spark, path, ["Id"])
    assert set(out.columns) >= {"Id", "Value", "select"}
    got = {r["Id"]: (r["Value"], r["select"]) for r in out.collect()}
    assert got == {1: ("x", 10), 2: ("y", 20)}


def test_approx_count_distinct_accuracy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
