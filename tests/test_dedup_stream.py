"""Streaming incremental dedup: foreachBatch around ingest_batch — the
streamed pair set must equal the batch-mode exact-Jaccard computation
over the same corpus (Kappa check), with cross-batch pairs appearing
only once the later member arrives."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs
from cassandra_analytics_spark.operators.dedup_index import LshIndexSpec
from cassandra_analytics_spark.streaming.dedup_stream import (
    collected_pairs,
    run_incremental_dedup_stream,
)

SPEC = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the cat watches from the warm windowsill every evening"
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "incoming")
    # batch 1: docs 0-9 incl. one internal near-dup pair (7, 8)
    b1 = [Row(doc_id=i, text=f"{BASE} variant {i} " + "filler words " * (i % 4))
          for i in range(7)]
    b1 += [Row(doc_id=7, text=BASE + " tweaked"),
           Row(doc_id=8, text=BASE + " tweaked slightly"),
           Row(doc_id=9, text="entirely different content here " * 5)]
    # batch 2: near-dup of doc 3 (cross-batch) + near-dup of doc 9
    b2 = [Row(doc_id=100, text=f"{BASE} variant 3 " + "filler words " * 3 + "x"),
          Row(doc_id=101, text="entirely different content here " * 5 + "coda")]
    _write_batch(spark, src, b1)
    _write_batch(spark, src, b2)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = "lsh_idx_stream_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    q = run_incremental_dedup_stream(
        stream,
        index_table=table,
        doc_store=str(tmp_path / "docs"),
        pairs_out=str(tmp_path / "pairs"),
        spec=SPEC,
        threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.a, r.b): r.jaccard
           for r in collected_pairs(spark, str(tmp_path / "pairs")).collect()}
    everything = spark.createDataFrame(b1 + b2)

    # Kappa twin: the streamed result equals the ONE-SHOT batch LSH path
    # over the full corpus (same spec, candidates then exact confirm) —
    # not raw exact Jaccard, which includes mid-similarity pairs banded
    # LSH probabilistically (and deterministically, given seeded hashes)
    # does not surface.
    from cassandra_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from cassandra_analytics_spark.operators.dedup_index import (
        confirm_candidates,
    )

    oneshot_cands = minhash_lsh_candidates(
        everything, num_hashes=SPEC.num_hashes, bands=SPEC.bands,
        shingle_n=SPEC.shingle_n, max_bucket=SPEC.max_bucket,
    )
    want = {(r.a, r.b): r.jaccard
            for r in confirm_candidates(
                oneshot_cands, everything, SPEC.shingle_n, 0.5).collect()}
    assert got == want
    assert (7, 8) in got        # within-batch pair, batch 1
    assert (3, 100) in got      # cross-batch pair via the index
    assert (9, 101) in got      # cross-batch pair via the index

    # and every streamed pair carries the exact-Jaccard score
    exact = {(r.a, r.b): r.jaccard
             for r in ngram_jaccard_pairs(
                 everything, shingle_n=SPEC.shingle_n, threshold=0.5).collect()}
    for k, v in got.items():
        assert abs(exact[k] - v) < 1e-12

    # pairs are attributed to the batch whose arrival completed them
    by_batch = {
        (r.a, r.b): r.batch_id
        for r in collected_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert by_batch[(7, 8)] == 0
    assert by_batch[(3, 100)] == 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")
