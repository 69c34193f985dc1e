"""Crash injection INSIDE the bundle 2-phase commit combined with
streaming replay (VERDICT r7 item 2): both mechanisms are individually
property-tested — this file kills the driver at the commit point
(between `_stage_bundle_job` and the rename) while a streaming dedup
pipeline is mid-batch, then restarts and asserts (a) no partial publish
was ever readable and (b) the replayed batch reconciles end to end:
pairs match the one-shot twin, the store holds each batch's data
exactly once under merge-on-read.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.dedup_index import (
    LshIndexSpec,
    build_index,
    ingest_batch,
)
from cassandra_analytics_spark.sinks.bundles import (
    bundle_write,
    restore_bundles,
    store_jobs,
)
from cassandra_analytics_spark.sinks.bulk_writer import read_bulk_table

SPEC = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the cat watches from the warm windowsill every evening"
)


class _CrashAtCommit:
    """Monkeypatch os.rename to die ONCE at the bundle commit point for
    a given store — the instant after staging completed and before the
    job dir exists, exactly where a driver crash leaves a `_staging-*`
    remnant and no committed job."""

    def __init__(self, monkeypatch, store_path: str):
        self.armed = True
        self.fired = False
        real_rename = os.rename

        def rename(src, dst):
            if (
                self.armed
                and os.path.dirname(os.path.abspath(dst)) == os.path.abspath(store_path)
                and os.path.basename(src).startswith("_staging-")
            ):
                self.armed = False
                self.fired = True
                raise OSError("injected crash at bundle commit point")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", rename)


def test_crash_between_stage_and_commit_publishes_nothing(
    spark, tmp_path, monkeypatch
):
    """Driver death at the commit rename: the staged job must be
    INVISIBLE to every reader (store_jobs, restore), and a retry must
    commit cleanly beside the stranded staging dir."""
    store = str(tmp_path / "store")
    os.makedirs(store)
    df = spark.createDataFrame(
        [Row(k=i, v=f"val-{i}", writetime=100) for i in range(20)]
    )

    crash = _CrashAtCommit(monkeypatch, store)
    with pytest.raises(OSError, match="injected crash"):
        bundle_write(df, store, ["k"])
    assert crash.fired
    # nothing readable: no job committed, the remnant is staging-only
    assert store_jobs(store) == []
    remnants = os.listdir(store)
    assert remnants and all(d.startswith("_staging-") for d in remnants)

    # retry (the caller's crash-recovery path) commits a fresh job
    res = bundle_write(df, store, ["k"])
    assert store_jobs(store) == [res.job_dir]

    table = str(tmp_path / "tbl")
    restore_bundles(spark, res.job_dir, table)
    got = {r.k: r.v for r in read_bulk_table(spark, table, ["k"]).collect()}
    assert got == {i: f"val-{i}" for i in range(20)}


def test_bundle_commit_crash_during_stream_replay_reconciles(
    spark, tmp_path, monkeypatch
):
    """The named frontier: a streaming pipeline that per micro-batch (1)
    runs incremental LSH dedup against the persistent index and (2)
    bundle-writes the batch to an object store. The bundle commit of
    batch 1 crashes AFTER ingest_batch already appended the batch's
    banded rows to the index — the worst interleaving: the stream dies
    with the index mutated but the checkpoint not advanced, so the
    restart REPLAYS a batch whose signatures are already indexed while
    the store holds a dead staging remnant.

    Must hold: no partial bundle publish is ever readable; the replayed
    ingest publishes byte-identical pairs (replay-idempotence of the
    index path); the store ends with each batch committed exactly once;
    merge-on-read over the restored batches equals the corpus exactly.
    """
    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    docs_dir = str(tmp_path / "docs")
    os.makedirs(store)
    table = "lsh_idx_crash_interact"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    b0 = [Row(doc_id=1, text=BASE + " original"),
          Row(doc_id=2, text="entirely different content here " * 5)]
    b1 = [Row(doc_id=3, text=BASE + " original tweaked")]  # near-dups doc 1
    spark.createDataFrame(b0).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    build_index(
        spark.createDataFrame([], "doc_id long, text string"), table, SPEC
    )

    def process(batch_df, batch_id: int) -> None:
        sp = batch_df.sparkSession
        batch = (
            batch_df.select("doc_id", "text")
            .groupBy("doc_id").agg(F.max("text").alias("text"))
        )
        if batch.isEmpty():
            return
        if os.path.isdir(docs_dir):
            texts = sp.read.parquet(docs_dir)
        else:
            texts = sp.createDataFrame([], batch.schema)
        confirmed = ingest_batch(sp, table, batch, texts, SPEC, 0.5)
        (confirmed.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(os.path.join(pairs_out, f"batch-{batch_id:010d}")))
        # deterministic writetime per batch: a replayed bundle commit
        # must merge-on-read to the SAME rows, not win by wall clock
        bundle_write(
            batch, store, ["doc_id"],
            write_timestamp_micros=1_000_000 + batch_id,
        )
        batch.write.mode("overwrite").parquet(docs_dir)

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    # arm the crash AFTER batch 0 commits: the first bundle rename goes
    # through, the second (batch 1) dies at the commit point
    real_rename = os.rename
    state = {"renames_seen": 0, "fired": False}

    def rename(src_p, dst_p):
        if (
            os.path.dirname(os.path.abspath(dst_p)) == os.path.abspath(store)
            and os.path.basename(src_p).startswith("_staging-")
        ):
            state["renames_seen"] += 1
            if state["renames_seen"] == 2 and not state["fired"]:
                state["fired"] = True
                raise OSError("injected crash at bundle commit point")
        return real_rename(src_p, dst_p)

    monkeypatch.setattr(os, "rename", rename)

    q = start()
    with pytest.raises(Exception):
        q.processAllAvailable()  # batch 1's foreachBatch raises
    q.stop()
    assert state["fired"]

    # no partial publish readable mid-crash; batch 1's data only in the
    # stranded staging remnant
    jobs_after_crash = store_jobs(store)
    assert len(jobs_after_crash) == 1
    assert any(d.startswith("_staging-") for d in os.listdir(store))

    # the crashed attempt already appended batch 1's banded rows
    # (refreshTable: the OBSERVING session caches the table's file
    # listing from any earlier read; the product path appends and probes
    # through the same writing session and needs no refresh — the
    # 100-batch soak pins that)
    spark.catalog.refreshTable(table)
    index_rows_after_crash = spark.table(table).count()
    assert index_rows_after_crash == 12  # (2 + 1) docs x 4 bands

    # restart: checkpoint replays batch 1 (index already mutated)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # (a) pairs reconcile: the cross-batch near-dup pair appears exactly
    # once, scored as the one-shot twin would
    pairs = spark.read.parquet(os.path.join(pairs_out, "batch-*"))
    got = {(r.a, r.b): round(r.jaccard, 12) for r in pairs.collect()}
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

    corpus = spark.createDataFrame(b0 + b1)
    want = {
        (r.a, r.b): round(r.jaccard, 12)
        for r in ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.5).collect()
    }
    assert got == want and (1, 3) in got

    # (b) the replay appended the index again — harmless by contract,
    # and visible (strictly more rows), proving this really was the
    # crashed-after-append interleaving
    spark.catalog.refreshTable(table)
    assert spark.table(table).count() > index_rows_after_crash

    # (c) the store: batch 1 committed exactly once by the replay;
    # merge-on-read over all restored jobs equals the corpus exactly
    jobs = store_jobs(store)
    assert len(jobs) == 2
    tbl = str(tmp_path / "restored")
    for j in jobs:
        restore_bundles(spark, j, tbl)
    restored = {
        r.doc_id: r.text
        for r in read_bulk_table(spark, tbl, ["doc_id"]).collect()
    }
    assert restored == {r.doc_id: r.text for r in b0 + b1}
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_coordinated_midcommit_crash_during_stream_replay(
    spark, tmp_path, monkeypatch
):
    """Coordinated TWO-store variant of the frontier: the joint commit of
    batch 1 dies after store A published but before store B (rollback
    unpublishes A), the stream dies, and the restart replays the batch.
    At every observable point the stores must agree (all-or-nothing),
    and after the replay both hold each batch's job exactly once."""
    src = str(tmp_path / "incoming")
    store_a = str(tmp_path / "store_a")
    store_b = str(tmp_path / "store_b")
    os.makedirs(store_a)
    os.makedirs(store_b)

    from cassandra_analytics_spark.sinks.bundles import (
        coordinated_bundle_write,
    )

    b0 = [Row(k=1, v="b0")]
    b1 = [Row(k=2, v="b1")]
    spark.createDataFrame(b0).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        coordinated_bundle_write(
            batch_df.select("k", "v"), [store_a, store_b], ["k"],
            write_timestamp_micros=1_000_000 + batch_id,
        )

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    # batch 0's joint commit (2 renames) succeeds; batch 1's SECOND
    # publish rename (store B) dies mid-joint-commit → rollback must
    # unpublish store A, then the stream errors out
    real_rename = os.rename
    state = {"publishes": 0, "fired": False}

    def rename(src_p, dst_p):
        if os.path.basename(dst_p).startswith("job-") and not os.path.basename(
            src_p
        ).startswith("job-"):
            state["publishes"] += 1
            if state["publishes"] == 4 and not state["fired"]:
                state["fired"] = True
                raise OSError("injected mid-joint-commit crash")
        return real_rename(src_p, dst_p)

    monkeypatch.setattr(os, "rename", rename)

    q = start()
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert state["fired"]

    # all-or-nothing held mid-crash: batch 1 visible in NEITHER store
    assert len(store_jobs(store_a)) == 1
    assert len(store_jobs(store_b)) == 1

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # replay committed batch 1 jointly; stores agree job-for-job by name
    jobs_a = [os.path.basename(j) for j in store_jobs(store_a)]
    jobs_b = [os.path.basename(j) for j in store_jobs(store_b)]
    assert len(jobs_a) == 2 and jobs_a == jobs_b

    # and each store restores to the same merged table content
    for store in (store_a, store_b):
        tbl = str(tmp_path / f"restored-{os.path.basename(store)}")
        for j in store_jobs(store):
            restore_bundles(spark, j, tbl)
        got = {r.k: r.v for r in read_bulk_table(spark, tbl, ["k"]).collect()}
        assert got == {1: "b0", 2: "b1"}
