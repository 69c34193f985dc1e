"""Streaming incremental semantic dedup (streaming/semantic_stream.py):
the stream's accumulated pairs must equal the one-shot SemDeDup pair set
over the same corpus, across batch boundaries, restarts, and replays."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.similarity import (
    removal_verdicts,
    semantic_dedup_pairs,
)
from cassandra_analytics_spark.streaming.semantic_stream import (
    collected_semantic_pairs,
    run_semantic_dedup_stream,
)


def _corpus_rows(n=60, dim=8, seed=3):
    """Vectors in two tight planted groups plus noise: group members are
    near-dups of their group's base vector."""
    rng = random.Random(seed)
    base_a = [1.0] + [0.0] * (dim - 1)
    base_b = [0.0] * (dim - 1) + [1.0]
    rows = []
    for i in range(n):
        if i % 3 == 0:
            v = [x + rng.uniform(-0.01, 0.01) for x in base_a]
        elif i % 3 == 1:
            v = [x + rng.uniform(-0.01, 0.01) for x in base_b]
        else:
            v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        rows.append((i, v))
    return rows


CENTROIDS = [(0, [1.0] + [0.0] * 7), (1, [0.0] * 7 + [1.0])]


def _run_stream(spark, src, tmp, threshold=0.98, **kwargs):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_semantic_dedup_stream(
        stream,
        index_path=os.path.join(tmp, "ivf"),
        pairs_out=os.path.join(tmp, "pairs"),
        centroids=CENTROIDS,
        threshold=threshold,
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        **kwargs,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_matches_one_shot_semantic_dedup(spark, tmp_path):
    """Two file-source micro-batches through a REAL foreachBatch run:
    the union of per-batch pairs equals the one-shot semantic_dedup_pairs
    set over the whole corpus — a pair missed across the batch boundary,
    reported twice, or mis-scored fails the comparison."""
    rows = _corpus_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "incoming")
    df.filter(F.col("vec_id") < 30).coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("vec_id") >= 30).coalesce(1).write.mode("append").parquet(src)

    _run_stream(spark, src, str(tmp_path))

    got = {
        (r.a, r.b, round(r.cosine_sim, 9))
        for r in collected_semantic_pairs(
            spark, str(tmp_path / "pairs")
        ).collect()
    }
    want = {
        (r.a, r.b, round(r.cosine_sim, 9))
        for r in semantic_dedup_pairs(df, CENTROIDS, threshold=0.98).collect()
    }
    assert got == want and len(want) > 50  # both planted groups pair up

    # the layout grew to the full corpus and serves downstream dedup
    layout = spark.read.parquet(str(tmp_path / "ivf"))
    assert layout.count() == 60
    verdicts = removal_verdicts(
        collected_semantic_pairs(spark, str(tmp_path / "pairs")).dropDuplicates(
            ["a", "b"]
        )
    )
    one_shot = removal_verdicts(
        semantic_dedup_pairs(df, CENTROIDS, threshold=0.98)
    )
    assert {tuple(r) for r in verdicts.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_stream_restart_needs_no_rebuild(spark, tmp_path):
    """Kill the stream after batch 1, start a NEW query over the same
    checkpoint + layout: the layout is path-persistent (no session
    catalog), so the post-restart batch still pairs against the full
    prior corpus."""
    rows = _corpus_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "incoming")
    df.filter(F.col("vec_id") < 30).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, str(tmp_path))  # first query: batch 0 only

    # second query (fresh StreamingQuery object = restart) sees batch 1
    df.filter(F.col("vec_id") >= 30).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, str(tmp_path))

    got = {
        (r.a, r.b)
        for r in collected_semantic_pairs(
            spark, str(tmp_path / "pairs")
        ).collect()
    }
    want = {
        (r.a, r.b)
        for r in semantic_dedup_pairs(df, CENTROIDS, threshold=0.98).collect()
    }
    # cross-restart pairs (one side per run) must be present
    cross = {(a, b) for a, b in want if a < 30 <= b}
    assert cross and cross <= got and got == want


def test_stream_duplicate_ids_and_validation(spark, tmp_path):
    """In-batch duplicate ids collapse deterministically (greatest
    vector wins) and never self-pair; degenerate parameters fail
    eagerly."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [1.0, 0.001])],
        "vec_id long, embedding array<double>",
    )
    src = str(tmp_path / "incoming")
    df.coalesce(1).write.mode("append").parquet(src)
    cents = [(0, [1.0, 0.0])]
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_semantic_dedup_stream(
        stream,
        index_path=str(tmp_path / "ivf"),
        pairs_out=str(tmp_path / "pairs"),
        centroids=cents,
        threshold=0.9,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = collected_semantic_pairs(spark, str(tmp_path / "pairs")).collect()
    assert [(r.a, r.b) for r in pairs] == [(1, 2)]  # no (1,1) self-pair
    # id 1 collapsed to the GREATEST vector [1.0, 0.0]
    kept = spark.read.parquet(str(tmp_path / "ivf")).filter("vec_id = 1")
    assert [list(r.embedding) for r in kept.collect()] == [[1.0, 0.0]]

    with pytest.raises(ValueError, match="threshold"):
        run_semantic_dedup_stream(
            stream, str(tmp_path / "i2"), str(tmp_path / "p2"),
            centroids=cents, threshold=1.5,
        )
    with pytest.raises(ValueError, match="codebook"):
        run_semantic_dedup_stream(
            stream, str(tmp_path / "i3"), str(tmp_path / "p3"), centroids=[],
        )
