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


def test_spec_mismatch_rejected(spark, tmp_path):
    """Round-7 adversarial pass: probing or appending with a different
    LshIndexSpec than the index was built with must raise — mismatched
    banding silently changes every bucket value and drops pairs."""
    from cassandra_analytics_spark.operators.dedup_index import (
        append_to_index,
        build_index,
        incremental_candidates,
    )

    table = "lsh_idx_spec_check"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    docs = spark.createDataFrame([Row(doc_id=1, text=BASE)])
    build_index(docs, table, SPEC)

    other = LshIndexSpec(num_hashes=16, bands=8, shingle_n=3, num_buckets=4)
    probe = spark.createDataFrame([Row(doc_id=2, text=BASE + " x")])
    with pytest.raises(ValueError, match="LshIndexSpec mismatch"):
        incremental_candidates(spark, table, probe, other)
    with pytest.raises(ValueError, match="LshIndexSpec mismatch"):
        append_to_index(probe, table, other)
    # the original spec still works
    incremental_candidates(spark, table, probe, SPEC).count()
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_in_batch_duplicate_id_collapses_deterministically(spark, tmp_path):
    """Round-7 adversarial pass: a batch carrying TWO texts for one id
    must collapse greatest-text-wins (the LWW convention) so a replay
    republishes identical pairs — not whichever copy dropDuplicates
    happened to keep."""
    src = str(tmp_path / "incoming")
    ta, tb = BASE + " aa", BASE + " zz"
    _write_batch(
        spark,
        src,
        [Row(doc_id=1, text=ta), Row(doc_id=1, text=tb), Row(doc_id=2, text=tb)],
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    table = "lsh_idx_dup_id"
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
    stored = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "docs") + "/batch-*").collect()
    }
    # greatest text wins for id 1 → its stored text is tb, and the (1, 2)
    # pair is exact-identical (jaccard 1.0)
    assert stored[1] == max(ta, tb) == tb
    got = {
        (r.a, r.b): r.jaccard
        for r in collected_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert got == {(1, 2): 1.0}
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_reingest_confirms_against_latest_text(spark, tmp_path):
    """Round-7 adversarial pass: a doc re-ingested with CHANGED content
    exists in several doc-store dirs; later confirms must use the LATEST
    text (latest-batch-wins via __batch_id), not an arbitrary copy."""
    src = str(tmp_path / "incoming")
    old_text = "completely unrelated original content " * 4
    new_text = BASE + " rewritten"
    probe_text = BASE + " rewritten!"
    # batch 0: doc 1 with old text; batch 1: doc 1 re-ingested with new
    # text; batch 2: doc 50 near-dups the NEW text only
    _write_batch(spark, src, [Row(doc_id=1, text=old_text)])
    _write_batch(spark, src, [Row(doc_id=1, text=new_text)])
    _write_batch(spark, src, [Row(doc_id=50, text=probe_text)])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    table = "lsh_idx_reingest"
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
    got = {
        (r.a, r.b): r.jaccard
        for r in collected_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    # the (1, 50) pair must carry the exact jaccard of the NEW text —
    # against the OLD text the pair wouldn't confirm at all (j ~ 0)
    assert (1, 50) in got
    both = spark.createDataFrame(
        [Row(doc_id=1, text=new_text), Row(doc_id=50, text=probe_text)]
    )
    want = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(both, shingle_n=3, threshold=0.5).collect()
    }
    assert abs(got[(1, 50)] - want[(1, 50)]) < 1e-12
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_mixed_old_new_doc_store_keeps_old_texts(spark, tmp_path):
    """/code-review r7: a store whose oldest dirs predate the __batch_id
    stamp must still surface THOSE docs' texts to the confirm (mergeSchema
    + coalesce(-1)), not lose them to an all-NULL max_by group."""
    import os

    from pyspark.sql import functions as F

    store = tmp_path / "docs"
    # legacy dir: no __batch_id column
    spark.createDataFrame([Row(doc_id=1, text=BASE + " old-doc")]).write.parquet(
        str(store / "batch-0000000000")
    )
    # stamped dir, different doc
    spark.createDataFrame(
        [Row(doc_id=2, text=BASE + " new-doc")]
    ).withColumn("__batch_id", F.lit(1)).write.parquet(
        str(store / "batch-0000000001")
    )
    stored = spark.read.option("mergeSchema", "true").parquet(
        str(store) + "/batch-*"
    )
    assert "__batch_id" in stored.columns
    texts = {
        r.doc_id: r.text
        for r in stored.groupBy("doc_id")
        .agg(
            F.max_by("text", F.coalesce(F.col("__batch_id"), F.lit(-1))).alias(
                "text"
            )
        )
        .collect()
    }
    assert texts[1] == BASE + " old-doc"  # legacy doc text survives
    assert texts[2] == BASE + " new-doc"


def test_append_to_index_bootstraps_missing_table(spark):
    """/code-review r7 regression: append_to_index on a fresh table name
    must bootstrap it (pre-r7 behavior), not crash in the spec check."""
    from cassandra_analytics_spark.operators.dedup_index import append_to_index

    table = "lsh_idx_bootstrap"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    append_to_index(
        spark.createDataFrame([Row(doc_id=1, text=BASE)]), table, SPEC
    )
    assert spark.table(table).count() > 0
    spark.sql(f"DROP TABLE {table}")


def test_collected_pairs_readable_mid_stream(spark, tmp_path):
    """A consumer polling collected_pairs while the stream is LIVE (the
    steady-state deployment shape) must see a readable, monotonically
    growing pair set — publishes are per-batch-dir atomic renames via
    parquet overwrite, never half-written files."""
    src = str(tmp_path / "incoming")
    _write_batch(spark, src, [Row(doc_id=1, text=BASE + " a"),
                              Row(doc_id=2, text=BASE + " b")])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    table = "lsh_idx_midstream"
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
        # stream still ACTIVE: read what has been published so far
        assert q.isActive
        first = {(r.a, r.b) for r in
                 collected_pairs(spark, str(tmp_path / "pairs")).collect()}
        assert first == {(1, 2)}
        # feed another batch while live; the set grows, never shrinks
        _write_batch(spark, src, [Row(doc_id=3, text=BASE + " c")])
        q.processAllAvailable()
        second = {(r.a, r.b) for r in
                  collected_pairs(spark, str(tmp_path / "pairs")).collect()}
        assert first <= second and {(1, 3), (2, 3)} <= second
    finally:
        q.stop()
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def _simulate_process_death(spark, table: str) -> None:
    """Catalog amnesia with the warehouse dir intact — exactly what a new
    process sees: DROP TABLE removes both the catalog entry AND the
    managed dir, so the dir is stashed and restored around the drop."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, table)
    stash = loc + ".stash"
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {table}")
    shutil.move(stash, loc)


def test_restart_in_new_process_recovers_corpus(spark, tmp_path):
    """ADVICE r8 medium: a stream restarted in a NEW process finds the
    doc store and checkpoint on disk but an empty in-memory catalog. The
    old bootstrap built an EMPTY index (silently rm -rf'ing the prior
    session's intact one via the stranded-location path) while the
    checkpoint skipped reprocessing — so post-restart docs were never
    compared against the pre-restart corpus. The bootstrap must instead
    rebuild the index from the doc store's latest texts."""
    import warnings

    src = str(tmp_path / "incoming")
    table = "lsh_idx_restart_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    b1 = [Row(doc_id=1, text=BASE + " original"),
          Row(doc_id=2, text="entirely different content here " * 5)]
    _write_batch(spark, src, b1)
    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_incremental_dedup_stream(
            stream,
            index_table=table,
            doc_store=str(tmp_path / "docs"),
            pairs_out=str(tmp_path / "pairs"),
            spec=SPEC,
            threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert collected_pairs(spark, str(tmp_path / "pairs")).count() == 0

    _simulate_process_death(spark, table)

    # after the "restart", a near-dup of the PRE-restart doc 1 arrives
    _write_batch(spark, src, [Row(doc_id=3, text=BASE + " original tweaked")])
    with warnings.catch_warnings():
        # the rebuild legitimately overwrites the stranded index copy
        warnings.simplefilter("ignore")
        q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.a, r.b) for r in
           collected_pairs(spark, str(tmp_path / "pairs")).collect()}
    assert (1, 3) in got, (
        "post-restart doc was not compared against the pre-restart corpus"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_restart_recovery_confirms_against_latest_reingested_text(spark, tmp_path):
    """The restart rebuild must index the doc store's LATEST text per id
    (latest-batch-wins), not an arbitrary copy: doc 1's first version
    matches nothing, its re-ingested version near-dups the post-restart
    arrival."""
    import warnings

    src = str(tmp_path / "incoming")
    table = "lsh_idx_restart_latest"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _write_batch(spark, src, [
        Row(doc_id=1, text="first version, unrelated to anything " * 4),
        Row(doc_id=2, text="other unrelated filler content " * 5),
    ])
    # re-ingest doc 1 with content that will near-dup the future doc 3
    _write_batch(spark, src, [Row(doc_id=1, text=BASE + " rewritten")])
    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_incremental_dedup_stream(
            stream,
            index_table=table,
            doc_store=str(tmp_path / "docs"),
            pairs_out=str(tmp_path / "pairs"),
            spec=SPEC,
            threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _simulate_process_death(spark, table)

    _write_batch(spark, src, [Row(doc_id=3, text=BASE + " rewritten plus")])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.a, r.b): r.jaccard for r in
           collected_pairs(spark, str(tmp_path / "pairs")).collect()}
    assert (1, 3) in got
    # scored against the REWRITTEN text, exactly as the batch twin would
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

    final = spark.createDataFrame([
        Row(doc_id=1, text=BASE + " rewritten"),
        Row(doc_id=3, text=BASE + " rewritten plus"),
    ])
    want = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(
        final, shingle_n=SPEC.shingle_n, threshold=0.5).collect()}
    assert abs(got[(1, 3)] - want[(1, 3)]) < 1e-12
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_legacy_doc_store_tie_breaks_greatest_text(spark, tmp_path):
    """ADVICE r8 low: several pre-__batch_id dirs carrying DIFFERENT
    texts for one id all rank -1, so max_by on the batch id alone picked
    a task-order-dependent winner. The struct (batch rank, text) key
    applies the repo's greatest-text-wins convention to legacy rows."""
    from cassandra_analytics_spark.streaming.dedup_stream import (
        _latest_store_texts,
    )

    store = str(tmp_path / "docs")
    # two legacy dirs (no __batch_id) with conflicting texts for id 1
    spark.createDataFrame([Row(doc_id=1, text="alpha text")]).write.parquet(
        os.path.join(store, "batch-0000000000"))
    spark.createDataFrame([Row(doc_id=1, text="zulu text")]).write.parquet(
        os.path.join(store, "batch-0000000001"))
    # one stamped dir (different id) so mergeSchema surfaces __batch_id
    spark.createDataFrame(
        [Row(doc_id=2, text="stamped", __batch_id=5)]
    ).write.parquet(os.path.join(store, "batch-0000000005"))

    texts = {r.doc_id: r.text
             for r in _latest_store_texts(spark, store, "doc_id", "text").collect()}
    assert texts[1] == "zulu text"   # greatest text wins among -1 ranks
    assert texts[2] == "stamped"


def test_compact_doc_store_mid_stream_preserves_semantics(spark, tmp_path):
    """Round 15: the doc store accrues one batch dir per trigger
    forever; compact_doc_store rewrites the latest-wins winners into
    one dir (keeping each row's original __batch_id) and optionally
    rebuilds the LSH index — and a stream that continues AFTER the
    compaction publishes exactly the pairs it would have anyway."""
    from cassandra_analytics_spark.streaming.dedup_stream import (
        _latest_store_texts,
        compact_doc_store,
    )

    src = str(tmp_path / "incoming")
    docs = str(tmp_path / "docs")
    table = "lsh_idx_compact_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    b1 = [Row(doc_id=i, text=f"{BASE} item {i} " + "pad " * (i % 3))
          for i in range(6)]
    # doc 2 re-ingested with CHANGED text in batch 2: latest must win
    # through the compaction
    b2 = [Row(doc_id=2, text=BASE + " rewritten entirely"),
          Row(doc_id=50, text=BASE + " tweaked"),
          Row(doc_id=51, text=BASE + " tweaked slightly")]
    b3 = [Row(doc_id=90, text=BASE + " tweaked slightly more")]

    _write_batch(spark, src, b1)
    _write_batch(spark, src, b2)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_incremental_dedup_stream(
        stream, index_table=table, doc_store=docs,
        pairs_out=str(tmp_path / "pairs"), spec=SPEC, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()  # triggers 1-2 -> two batch dirs

        before = {
            r.doc_id: r.text
            for r in _latest_store_texts(
                spark, docs, "doc_id", "text"
            ).collect()
        }
        stats = compact_doc_store(
            spark, docs, index_table=table, spec=SPEC
        )
        assert stats["dirs_after"] == 1 < stats["dirs_before"]
        assert stats["rows_after"] == len(before)  # superseded rows gone
        after = {
            r.doc_id: r.text
            for r in _latest_store_texts(
                spark, docs, "doc_id", "text"
            ).collect()
        }
        assert after == before
        assert after[2] == BASE + " rewritten entirely"  # latest won

        # the stream continues over the compacted store + rebuilt index
        _write_batch(spark, src, b3)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.a, r.b) for r in collected_pairs(
        spark, str(tmp_path / "pairs")
    ).collect()}
    # the cross-compaction pairs landed: 90 is a near-dup of 50 and 51
    # (ingested before the compaction), found via the REBUILT index
    assert (50, 90) in got and (51, 90) in got

    # refusals
    with pytest.raises(ValueError, match="no batch-"):
        compact_doc_store(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="num_files"):
        compact_doc_store(spark, docs, num_files=0)


def test_compact_pairs_store_mid_stream_row_preserving(spark, tmp_path):
    """Round 16 (VERDICT r15 item 3): the pairs store was the last
    durable store still accruing one batch dir per trigger forever.
    compact_pairs_store is ROW-preserving (pairs are append-only facts
    — batch_id and score rewritten verbatim), readers see the identical
    multiset through the compaction, and a stream that continues AFTER
    it publishes new dirs next to the compacted one."""
    from cassandra_analytics_spark.streaming.dedup_stream import (
        compact_pairs_store,
    )

    src = str(tmp_path / "incoming")
    pairs_out = str(tmp_path / "pairs")
    table = "lsh_idx_pairs_compact_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    b1 = [Row(doc_id=7, text=BASE + " tweaked"),
          Row(doc_id=8, text=BASE + " tweaked slightly")]
    b2 = [Row(doc_id=50, text=BASE + " tweaked"),
          Row(doc_id=51, text=BASE + " tweaked a bit")]
    b3 = [Row(doc_id=90, text=BASE + " tweaked slightly more")]
    _write_batch(spark, src, b1)
    _write_batch(spark, src, b2)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_incremental_dedup_stream(
        stream, index_table=table, doc_store=str(tmp_path / "docs"),
        pairs_out=pairs_out, spec=SPEC, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()  # triggers 1-2 -> two pairs dirs

        before = sorted(
            (r.a, r.b, round(r.jaccard, 9), r.batch_id)
            for r in collected_pairs(spark, pairs_out).collect()
        )
        assert before  # the fixture publishes pairs pre-compaction
        stats = compact_pairs_store(spark, pairs_out)
        assert stats["dirs_after"] == 1 < stats["dirs_before"]
        assert stats["files_after"] < stats["files_before"]
        assert stats["rows_after"] == len(before)
        after = sorted(
            (r.a, r.b, round(r.jaccard, 9), r.batch_id)
            for r in collected_pairs(spark, pairs_out).collect()
        )
        assert after == before  # row-preserving, batch_id intact

        # the stream continues: new dirs land NEXT TO the compacted one
        _write_batch(spark, src, b3)
        q.processAllAvailable()
    finally:
        q.stop()
    final = sorted(
        (r.a, r.b)
        for r in collected_pairs(spark, pairs_out).collect()
    )
    assert (7, 90) in final and (50, 90) in final  # cross-compaction
    assert [p for p in final if p in {t[:2] for t in before}]

    # a second compaction folds the post-compaction dirs in too
    stats2 = compact_pairs_store(spark, pairs_out, num_files=2)
    assert stats2["dirs_after"] == 1
    assert sorted(
        (r.a, r.b) for r in collected_pairs(spark, pairs_out).collect()
    ) == final

    # refusals
    with pytest.raises(ValueError, match="no batch-"):
        compact_pairs_store(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="num_files"):
        compact_pairs_store(spark, pairs_out, num_files=0)
