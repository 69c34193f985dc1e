"""hash_split stability invariants — the properties that make an id-hash
split safe for training pipelines (SURVEY north-star: training-data ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.operators.sampling import hash_split, stratified_sample


def test_split_is_deterministic_and_partition_independent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in hash_split(d).select("doc_id", "split").collect()}
    # different physical partitioning must not change any assignment
    b = {
        r.doc_id: r.split
        for r in hash_split(d.repartition(7)).select("doc_id", "split").collect()
    }
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}


def test_split_proportions_roughly_match(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    counts = {
        r.split: r.n
        for r in hash_split(d).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert total == d.count()
    # 2^16-bucket md5 hash is uniform; at >=1000 docs the 80/10/10 split
    # should land within a few points
    assert abs(counts["train"] / total - 0.80) < 0.05
    assert abs(counts["val"] / total - 0.10) < 0.04
    assert abs(counts["test"] / total - 0.10) < 0.04


def test_split_is_a_pure_projection(spark, sf_dir):
    # no Exchange in the plan: assignment must be computable row-local
    import contextlib
    import io

    d = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_split(d).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stratified_sample_seed_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5, "it": 0.5}
    a = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, seed=7).collect())
    b = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, seed=7).collect())
    assert a == b
    assert 0 < len(a) < d.count()
