"""Persistent signature-partitioned ANN index: pruned reads + recall."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_spark.fixtures import ensure_fixtures
from cassandra_analytics_spark.operators.ann_index import (
    build_ann_index,
    query_ann_index,
)
from cassandra_analytics_spark.operators.similarity import brute_force_topk

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")


@pytest.fixture(scope="module")
def corpus(spark):
    ensure_fixtures(FIXTURE_DIR)
    return (
        spark.read.parquet(os.path.join(FIXTURE_DIR, "docs_dedup.parquet"))
        .select(F.col("doc_id").alias("vec_id"), "embedding", "origin_id")
    )


def test_index_prunes_partitions_and_recalls(spark, corpus, tmp_path):
    index_path = str(tmp_path / "ann")
    build_ann_index(corpus, index_path, num_planes=6)
    # partition dirs exist per signature
    sig_dirs = [d for d in os.listdir(index_path) if d.startswith("sig=")]
    assert len(sig_dirs) > 8

    hot = (
        corpus.filter(F.col("vec_id") != F.col("origin_id"))
        .groupBy("origin_id").count()
        .orderBy(F.col("count").desc(), "origin_id").first()["origin_id"]
    )
    qvec = [
        float(x)
        for x in corpus.filter(F.col("vec_id") == hot).first()["embedding"]
    ]

    result = query_ann_index(spark, index_path, qvec, k=5, num_planes=6)
    rows = result.collect()
    # pruned scan: the sig predicate is a partition filter on the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    part_filter_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_filter_lines and "sig" in part_filter_lines[0]

    exact = {r.vec_id for r in brute_force_topk(corpus, qvec, k=5).collect()}
    approx = {r.vec_id for r in rows}
    assert len(exact & approx) / 5 >= 0.6
    assert hot in approx  # the origin itself must be found


def test_full_radius_multiprobe_equals_brute_force(spark, tmp_path):
    """probe_hamming=num_planes probes every bucket, so the result must
    equal exact brute-force top-k (a 1-flip-only probe loop silently
    capped the radius and lost recall for probe_hamming >= 2)."""
    import random

    from cassandra_analytics_spark.operators.ann_index import (
        build_ann_index,
        query_ann_index,
    )
    from cassandra_analytics_spark.operators.similarity import brute_force_topk

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.gauss(0, 1) for _ in range(8)]
    path = str(tmp_path / "annidx")
    build_ann_index(df, path, num_planes=4)
    got = [
        r.vec_id
        for r in query_ann_index(
            spark, path, q, k=10, num_planes=4, probe_hamming=4
        ).collect()
    ]
    want = [r.vec_id for r in brute_force_topk(df, q, k=10).collect()]
    assert got == want


def test_empty_corpus_index_builds_and_queries(spark, tmp_path):
    """Round-7 hostile pass: building either index over an EMPTY corpus
    must produce a readable empty index (no dim-probe TypeError, no
    null-cell partition), and queries over it return empty."""
    from cassandra_analytics_spark.operators.ann_index import (
        build_ann_index,
        build_ivf_index,
        query_ivf_index,
    )

    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    ann_path = str(tmp_path / "ann_idx")
    build_ann_index(empty, ann_path)
    assert spark.read.parquet(ann_path).count() == 0

    ivf_path = str(tmp_path / "ivf_idx")
    build_ivf_index(empty, ivf_path)
    got = query_ivf_index(spark, ivf_path, [0.0, 1.0, 0.0], k=5)
    assert got.count() == 0
