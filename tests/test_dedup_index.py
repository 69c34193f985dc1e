"""Incremental bucketed MinHash-LSH index: correctness vs the one-shot
path, and the plan-level guarantee that the corpus side of the
incremental candidate join is NOT re-shuffled (the whole point)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cassandra_analytics_spark.operators.dedup import minhash_lsh_candidates
from cassandra_analytics_spark.operators.dedup_index import (
    LshIndexSpec,
    append_to_index,
    banded_rows,
    build_index,
    incremental_candidates,
)

SPEC = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)


def _doc(i: int, text: str) -> Row:
    return Row(doc_id=i, text=text)


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm windowsill every evening"
    )
    corpus = [
        _doc(i, f"{base} variant {i} " + "filler words " * (i % 5))
        for i in range(40)
    ]
    # new batch: 5 near-dups of corpus docs + 2 near-dups of each other
    # + 3 unrelated docs
    batch = (
        [_doc(100 + i, f"{base} variant {i} " + "filler words " * (i % 5) + "tail")
         for i in range(5)]
        + [_doc(200, base + " tweaked once"), _doc(201, base + " tweaked once more")]
        + [_doc(300 + i, f"completely different text number {i} " * 6)
           for i in range(3)]
    )
    return spark.createDataFrame(corpus), spark.createDataFrame(batch)


def test_incremental_matches_oneshot(spark, corpus_and_batch, tmp_path_factory):
    corpus, batch = corpus_and_batch
    table = "lsh_idx_correctness"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, SPEC)

    inc = {
        (r.a, r.b): r.est_jaccard
        for r in incremental_candidates(spark, table, batch, SPEC).collect()
    }
    full = minhash_lsh_candidates(
        corpus.unionByName(batch),
        num_hashes=SPEC.num_hashes,
        bands=SPEC.bands,
        shingle_n=SPEC.shingle_n,
    )
    new_ids = {r.doc_id for r in batch.collect()}
    want = {
        (r.a, r.b): r.est_jaccard
        for r in full.collect()
        if r.a in new_ids or r.b in new_ids
    }
    assert inc == want
    # sanity: the planted near-dups actually surface
    assert any(a in new_ids or b in new_ids for a, b in inc)
    assert (200, 201) in inc
    spark.sql(f"DROP TABLE {table}")


def test_append_then_next_batch_sees_previous(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    table = "lsh_idx_append"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, SPEC)
    append_to_index(batch, table, SPEC)

    batch2 = spark.createDataFrame(
        [_doc(999, "the quick brown fox jumps over the lazy dog again and "
                   "again while the cat watches from the warm windowsill "
                   "every evening tweaked once")]
    )
    pairs = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch2, SPEC).collect()
    }
    # doc 999 is a near-dup of 200/201 which live only in the appended batch
    assert (200, 999) in pairs or (201, 999) in pairs
    spark.sql(f"DROP TABLE {table}")


def _exchange_count(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return plan.count(") Exchange")


def test_corpus_side_is_not_shuffled(spark, corpus_and_batch):
    """The bucketed index join must not re-shuffle the corpus: the same
    probe against an identical but UNBUCKETED table plans exactly THREE
    more Exchanges — one per corpus-touching operator (the (band,bucket,
    id) dedup, the hot-bucket occupancy count, and the candidate join),
    each of which is satisfied for free by the bucketed layout."""
    corpus, batch = corpus_and_batch
    bucketed, flat = "lsh_idx_bucketed", "lsh_idx_flat"
    for t in (bucketed, flat):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    build_index(corpus, bucketed, SPEC)
    banded_rows(corpus, SPEC).write.format("parquet").saveAsTable(flat)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        kwargs = dict(
            spec=SPEC, broadcast_new=False, include_new_new=False
        )
        df_bucketed = incremental_candidates(spark, bucketed, batch, **kwargs)
        n_bucketed = _exchange_count(df_bucketed)
        n_flat = _exchange_count(
            incremental_candidates(spark, flat, batch, **kwargs)
        )
        assert n_flat == n_bucketed + 3
        # and the join really consumes the scan's bucketing (the scan
        # renders bucket info only when the plan exploits it)
        plan = df_bucketed._sc._jvm.PythonSQLUtils.explainString(
            df_bucketed._jdf.queryExecution(), "formatted"
        )
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in (bucketed, flat):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_broadcast_probe_is_fully_exchange_free_on_corpus(
    spark, corpus_and_batch
):
    """broadcast_new=True: the join is BroadcastHashJoin — the corpus
    side reads bucketed files with no Exchange anywhere above its scan.
    The remaining shuffle Exchanges all operate on tiny relations: the
    probe's signature groupBy, the final pair dedup, and the hot-bucket
    stat aggregates ((band, bucket) counts — bounded by distinct buckets,
    never corpus rows; the corpus-side count itself is exchange-free off
    the bucketed layout)."""
    corpus, batch = corpus_and_batch
    table = "lsh_idx_bcast"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, SPEC)
    df = incremental_candidates(
        spark, table, batch, SPEC, broadcast_new=True, include_new_new=False
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    # probe groupBy + dropDuplicates + hot-bucket stat aggs, plus one
    # textual duplicate of the probe's signature-groupBy Exchange from
    # the occupancy anti-join's third reference to the banded lineage
    # (collapsed at runtime by exchange reuse); a corpus re-shuffle would
    # add more (asserted via the flat-table delta in
    # test_corpus_side_is_not_shuffled)
    assert plan.count(") Exchange") <= 6
    spark.sql(f"DROP TABLE {table}")


def test_hot_bucket_cap_matches_oneshot(spark, corpus_and_batch):
    """Buckets over max_bucket are skipped identically in the incremental
    and one-shot paths — the cap-parity case the small-bucket parity test
    can't exercise."""
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every evening")
    spec = LshIndexSpec(
        num_hashes=16, bands=4, shingle_n=3, num_buckets=4, max_bucket=4
    )
    # 6 identical docs (4 corpus + 2 batch) saturate their buckets past
    # the cap of 4; one clean near-dup pair in the batch must survive.
    corpus = spark.createDataFrame([_doc(i, base) for i in range(4)])
    batch = spark.createDataFrame(
        [_doc(100, base), _doc(101, base),
         _doc(200, "some other much rarer document text entirely " * 4),
         _doc(201, "some other much rarer document text entirely " * 4 + "x")]
    )
    table = "lsh_idx_hotcap"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, spec)
    inc = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch, spec).collect()
    }
    full = minhash_lsh_candidates(
        corpus.unionByName(batch),
        num_hashes=spec.num_hashes,
        bands=spec.bands,
        shingle_n=spec.shingle_n,
        max_bucket=spec.max_bucket,
    )
    new_ids = {100, 101, 200, 201}
    want = {
        (r.a, r.b)
        for r in full.collect()
        if r.a in new_ids or r.b in new_ids
    }
    assert inc == want
    assert (200, 201) in inc          # un-capped bucket pairs survive
    assert (100, 101) not in inc      # hot-bucket pairs are dropped
    spark.sql(f"DROP TABLE {table}")


def test_ingest_batch_pipeline_two_batches(spark, corpus_and_batch):
    """ingest_batch over two successive batches: batch1's near-dups are
    found against the seed corpus, batch2's near-dups are found against
    docs that arrived only in batch1 (proving the append really extends
    the index), and confirmed scores are exact Jaccard."""
    from cassandra_analytics_spark.operators.dedup_index import ingest_batch

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm windowsill every evening"
    )
    seed_rows = [_doc(i, f"{base} variant {i} " + "filler words " * (i % 5))
                 for i in range(20)]
    seed = spark.createDataFrame(seed_rows)
    # batch1: near-dup of seed doc 3 + one novel doc
    b1 = spark.createDataFrame([
        _doc(100, f"{base} variant 3 " + "filler words " * 3 + "tail"),
        _doc(101, "an entirely unrelated document about something else " * 4),
    ])
    # batch2: near-dup of batch1's novel doc (NOT in the seed corpus)
    b2 = spark.createDataFrame([
        _doc(200, "an entirely unrelated document about something else " * 4
                  + "coda"),
    ])

    table = "lsh_idx_ingest_pipe"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(seed, table, SPEC)

    texts = seed
    got1 = ingest_batch(spark, table, b1, texts, SPEC, threshold=0.5)
    pairs1 = {(r.a, r.b): r.jaccard for r in got1.collect()}
    assert (3, 100) in pairs1
    assert all(a in {b.doc_id for b in b1.collect()}
               or b in {x.doc_id for x in b1.collect()} for a, b in pairs1)

    texts = texts.unionByName(b1)
    got2 = ingest_batch(spark, table, b2, texts, SPEC, threshold=0.5)
    pairs2 = {(r.a, r.b): r.jaccard for r in got2.collect()}
    assert (101, 200) in pairs2          # found via the APPENDED index rows
    assert 0.5 <= pairs2[(101, 200)] <= 1.0

    # confirmed scores are exact Jaccard, not the LSH estimate
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs
    allx = seed.unionByName(b1).unionByName(b2)
    exact = {(r.a, r.b): r.jaccard
             for r in ngram_jaccard_pairs(
                 allx, shingle_n=SPEC.shingle_n, threshold=0.5).collect()}
    for k, v in {**pairs1, **pairs2}.items():
        assert abs(exact[k] - v) < 1e-12
    spark.sql(f"DROP TABLE {table}")


def test_confirm_candidates_work_is_candidate_bounded(spark):
    """The confirm step must semi-join the document store down to the ids
    that appear in some candidate pair BEFORE shingling — plan shows the
    involved-id set broadcast into the text scan, so shingle work is
    proportional to candidate volume, never corpus size."""
    from cassandra_analytics_spark.operators.dedup_index import (
        confirm_candidates,
    )

    texts = spark.createDataFrame(
        [_doc(i, f"some document body number {i} with words") for i in range(50)]
    )
    cands = spark.createDataFrame([Row(a=1, b=2), Row(a=3, b=4)])
    out = confirm_candidates(cands, texts, shingle_n=3, threshold=0.0)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    # correctness of the restriction: only candidate-pair ids are scored
    rows = out.collect()
    assert {(r.a, r.b) for r in rows} <= {(1, 2), (3, 4)}


def test_duplicate_index_rows_cannot_change_results(spark, corpus_and_batch):
    """A replayed streaming append duplicates banded rows in the index;
    candidates AND hot-bucket occupancy must be unaffected (the corpus is
    deduplicated on (band, bucket, id) before both)."""
    corpus, batch = corpus_and_batch
    clean, dup = "lsh_idx_replay_clean", "lsh_idx_replay_dup"
    for t in (clean, dup):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    build_index(corpus, clean, SPEC)
    build_index(corpus, dup, SPEC)
    append_to_index(corpus, dup, SPEC)   # replayed append: every row twice
    want = {
        (r.a, r.b): r.est_jaccard
        for r in incremental_candidates(spark, clean, batch, SPEC).collect()
    }
    got = {
        (r.a, r.b): r.est_jaccard
        for r in incremental_candidates(spark, dup, batch, SPEC).collect()
    }
    assert got == want and want
    for t in (clean, dup):
        spark.sql(f"DROP TABLE {t}")


def test_replayed_batch_does_not_double_count_occupancy(spark):
    """ADVICE r4 (medium): after a partial index append, a replay
    presents the batch's docs on BOTH sides of the occupancy count. Each
    distinct doc must count once — double-counting could push a bucket
    past max_bucket only on the replay, silently dropping its pairs and
    breaking replay-idempotence."""
    spec = LshIndexSpec(
        num_hashes=16, bands=4, shingle_n=3, num_buckets=4, max_bucket=20
    )
    # identical texts -> identical signatures -> one bucket per band
    text = "identical document text repeated for bucket saturation " * 3
    corpus = spark.createDataFrame([_doc(i, text) for i in range(10)])
    batch = spark.createDataFrame([_doc(100 + i, text) for i in range(8)])
    table = "lsh_idx_replay_occupancy"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, spec)

    # first attempt: occupancy 10 + 8 = 18 <= 20, bucket survives
    want = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch, spec).collect()
    }
    assert want

    # partial append succeeded, then the batch replays: naive
    # corpus+new counting would see 18 + 8 = 26 > 20 and drop the bucket
    append_to_index(batch, table, spec)
    got = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch, spec).collect()
    }
    assert got == want
    spark.sql(f"DROP TABLE {table}")


def test_changed_content_reingest_still_counts_old_rows(spark):
    """The replay guard anti-joins on the full (band, bucket, id) cell,
    not the id alone: when a batch re-presents an id with CHANGED
    content, the old signature's index rows occupy different cells, stay
    in the index, and still feed pair generation — so they must still
    count toward occupancy. An id-only anti-join would exclude them,
    undercount the bucket, and let an over-full bucket escape the cap."""
    spec = LshIndexSpec(
        num_hashes=16, bands=4, shingle_n=3, num_buckets=4, max_bucket=20
    )
    text_a = "identical document text repeated for bucket saturation " * 3
    text_b = "a completely different body of words with other shingles " * 3
    corpus = spark.createDataFrame([_doc(i, text_a) for i in range(20)])
    # the batch re-ingests id 0 with new content AND adds one new text-A doc
    batch = spark.createDataFrame([_doc(0, text_b), _doc(100, text_a)])
    table = "lsh_idx_changed_content"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, spec)

    # true text-A occupancy: 20 old rows (id 0's old rows included — they
    # are still in the index) + 1 new doc = 21 > max_bucket -> the bucket
    # must be dropped. id-only anti-joining would count 19 + 1 = 20 and
    # emit the pairs.
    got = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch, spec).collect()
    }
    assert got == set()

    # positive control: with a roomier cap the same join emits the
    # new-doc x corpus pairs (the emptiness above is the cap, not a bug)
    roomy = LshIndexSpec(
        num_hashes=16, bands=4, shingle_n=3, num_buckets=4, max_bucket=30
    )
    got_roomy = {
        (r.a, r.b)
        for r in incremental_candidates(spark, table, batch, roomy).collect()
    }
    assert any(100 in pair for pair in got_roomy)
    spark.sql(f"DROP TABLE {table}")


def test_ingest_batch_confirms_against_the_batchs_new_text(spark):
    """A re-ingest with CHANGED content must confirm pairs against the
    NEW text: the text-store union used to dropDuplicates arbitrarily,
    so scores flickered between old and new content across runs."""
    from cassandra_analytics_spark.operators.dedup_index import ingest_batch

    twin = "alpha beta gamma delta epsilon zeta eta theta " * 4
    corpus = spark.createDataFrame([
        _doc(1, "totally unrelated original content about nothing " * 4),
        _doc(2, twin),
    ])
    table = "lsh_idx_changed_text"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_index(corpus, table, SPEC)

    # doc 1 re-ingested with content nearly identical to doc 2: with the
    # NEW text the (1, 2) pair is a high-Jaccard dup; with the OLD text
    # it confirms nothing
    batch = spark.createDataFrame([_doc(1, twin + "coda")])
    got = {
        (r.a, r.b): r.jaccard
        for r in ingest_batch(
            spark, table, batch, texts=corpus, spec=SPEC, threshold=0.5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.5
    spark.sql(f"DROP TABLE {table}")


def test_build_index_survives_stranded_location(spark):
    """The default in-memory catalog forgets tables when a session dies
    but the warehouse directory persists; build_index (an explicit
    overwrite) must reclaim such a stranded location instead of failing
    every subsequent run with LOCATION_ALREADY_EXISTS (round-7 fix)."""
    import os

    table = "lsh_idx_stranded"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stranded = os.path.join(warehouse, table)
    os.makedirs(stranded, exist_ok=True)
    with open(os.path.join(stranded, "orphan.parquet"), "w") as f:
        f.write("stranded by a crashed session")

    docs = spark.createDataFrame([_doc(1, "some text for the index " * 3)])
    build_index(docs, table, SPEC)  # must not raise
    assert spark.table(table).count() > 0
    assert not os.path.exists(os.path.join(stranded, "orphan.parquet"))
    spark.sql(f"DROP TABLE {table}")


def test_build_index_refuses_foreign_data_at_location(spark):
    """/code-review r7: stranded-location reclamation must NOT delete
    readable NON-index data parked at the warehouse path (a concurrent
    session's table, an unrelated dataset) — only crash garbage or a
    stale banded index."""
    import os
    import shutil

    table = "lsh_idx_foreign"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, table)
    shutil.rmtree(loc, ignore_errors=True)
    spark.createDataFrame([(1, "precious")], "k INT, v STRING").write.parquet(loc)

    docs = spark.createDataFrame([_doc(1, "text for the index " * 3)])
    with pytest.raises(ValueError, match="NON-index data"):
        build_index(docs, table, SPEC)
    # the foreign data is untouched
    assert spark.read.parquet(loc).count() == 1
    shutil.rmtree(loc, ignore_errors=True)


def test_ingest_batch_replay_is_idempotent(spark):
    """The streaming layer's at-least-once replay story, tested literally
    (round-7): re-running ingest_batch for the SAME batch — after its
    first attempt already appended the index (and its docs already landed
    in the store) — must confirm the SAME pairs, and a later batch must
    behave as if the replay never happened."""
    from cassandra_analytics_spark.operators.dedup_index import (
        build_index,
        ingest_batch,
    )

    spec = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every evening")
    table = "lsh_idx_replay"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    corpus = spark.createDataFrame(
        [_doc(1, base + " one"), _doc(2, "unrelated words " * 8)]
    )
    build_index(corpus, table, spec)

    batch = spark.createDataFrame([_doc(10, base + " one!"),
                                   _doc(11, base + " one!!")])
    first = {
        (r.a, r.b): r.jaccard
        for r in ingest_batch(
            spark, table, batch, corpus, spec, threshold=0.5
        ).collect()
    }
    assert (1, 10) in first and (10, 11) in first

    # REPLAY: index already holds the batch's rows; the doc store (texts)
    # already holds its docs — exactly the state a foreachBatch retry sees
    texts_after = corpus.unionByName(batch)
    replay = {
        (r.a, r.b): r.jaccard
        for r in ingest_batch(
            spark, table, batch, texts_after, spec, threshold=0.5
        ).collect()
    }
    assert replay == first  # byte-identical publish

    # a later batch sees consistent state despite the double append
    nxt = spark.createDataFrame([_doc(20, base + " one!?")])
    nxt_pairs = {
        (r.a, r.b)
        for r in ingest_batch(
            spark, table, nxt, texts_after, spec, threshold=0.5
        ).collect()
    }
    assert {(1, 20), (10, 20), (11, 20)} <= nxt_pairs
    spark.sql(f"DROP TABLE {table}")


def test_append_bootstrap_pins_spec(spark):
    """ADVICE r8 low: an index bootstrapped via append_to_index on a
    missing table (a sanctioned flow) must still get the cas.lsh.spec
    pin — otherwise every later mismatched-spec probe passes _check_spec
    silently, the exact bug class the pin exists to catch."""
    table = "lsh_idx_append_boot"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    docs = spark.createDataFrame([_doc(1, "text for the index " * 3)])
    append_to_index(docs, table, SPEC)

    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    assert "cas.lsh.spec" in {r["key"] for r in rows}

    other = LshIndexSpec(num_hashes=16, bands=8, shingle_n=3, num_buckets=4)
    probe = spark.createDataFrame([_doc(2, "probe text " * 3)])
    with pytest.raises(ValueError, match="LshIndexSpec mismatch"):
        incremental_candidates(spark, table, probe, other)
    spark.sql(f"DROP TABLE {table}")


def test_overwriting_stranded_nonempty_index_warns(spark):
    """ADVICE r8: deleting a readable, NON-empty banded index on the
    strength of one session's catalog amnesia must at least be loud — a
    prior session's intact corpus index is indistinguishable from crash
    garbage here."""
    import os
    import shutil
    import warnings

    table = "lsh_idx_warn_overwrite"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    docs = spark.createDataFrame([_doc(1, "some corpus text " * 3)])
    build_index(docs, table, SPEC)
    # simulate a new process: stash the dir, drop the table, restore
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, table)
    shutil.copytree(loc, loc + ".stash")
    spark.sql(f"DROP TABLE {table}")
    shutil.move(loc + ".stash", loc)

    with pytest.warns(UserWarning, match="non-empty banded LSH"):
        build_index(docs, table, SPEC)
    assert spark.table(table).count() > 0

    # an EMPTY stranded index (crash before any rows landed) reclaims
    # silently — nothing of value is lost
    empty = spark.createDataFrame([], "doc_id long, text string")
    spark.sql(f"DROP TABLE {table}")
    build_index(empty, table, SPEC)
    shutil.copytree(loc, loc + ".stash")
    spark.sql(f"DROP TABLE {table}")
    shutil.move(loc + ".stash", loc)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        build_index(empty, table, SPEC)
    assert not [w for w in caught if issubclass(w.category, UserWarning)]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_mixed_case_db_reclaims_and_pins(spark):
    """ADVICE r8 low: identifier handling — a db-qualified, mixed-case
    table name must derive the SAME warehouse path Spark writes
    (lowercased segments) for stranded-location reclamation, and the
    generated SHOW/ALTER SQL must quote the parts."""
    import os
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS LshCaseDb")
    table = "LshCaseDb.IdxMixed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    docs = spark.createDataFrame([_doc(1, "mixed case db text " * 3)])
    build_index(docs, table, SPEC)
    probe = spark.createDataFrame([_doc(2, "mixed case db text " * 3 + "x")])
    assert incremental_candidates(spark, table, probe, SPEC).count() >= 0

    # strand it, then rebuild: path derivation must hit the real dir
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, "lshcasedb.db", "idxmixed")
    assert os.path.isdir(loc), "test premise: Spark lowercases the path"
    shutil.copytree(loc, loc + ".stash")
    spark.sql(f"DROP TABLE {table}")
    shutil.move(loc + ".stash", loc)
    with pytest.warns(UserWarning, match="non-empty banded LSH"):
        build_index(docs, table, SPEC)
    assert spark.table(table).count() > 0
    spark.sql(f"DROP TABLE {table}")
    spark.sql("DROP DATABASE LshCaseDb")
