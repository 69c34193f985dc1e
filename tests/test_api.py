"""Engine facade: the switch-over surface for a reference user."""

from __future__ import annotations

from pyspark.sql import Row

from cassandra_analytics_spark import Engine


def test_engine_lifecycle(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir=sf_dir)
    li = eng.read_table("lineitem")
    assert li.count() > 0

    table = eng.table_from_ddl(
        "CREATE TABLE ks.t (id bigint, ck int, v text, PRIMARY KEY (id, ck));"
    )
    assert [c.name for c in table.partition_keys] == ["id"]

    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(id=1, ck=1, v="a"), Row(id=2, ck=1, v="b")])
    eng.bulk_write(df, path, ["id"], clustering_keys=["ck"], table=table,
                   write_timestamp_micros=1_000)
    eng.delete_partitions(
        spark.createDataFrame([Row(id=1)]), path, ["id"],
        clustering_keys=["ck"], write_timestamp_micros=2_000,
    )
    out = eng.read_bulk_table(path, ["id"], ["ck"])
    assert {r.id for r in out.collect()} == {2}

    views = eng.register_views()
    assert "orders" in views
    assert spark.sql("SELECT count(*) FROM orders").collect()[0][0] > 0


def test_engine_cell_lww_bulk_roundtrip(spark, tmp_path):
    """Upsert-style table through the facade: partial writes must not
    null out earlier columns when read with cell_lww=True."""
    from pyspark.sql import Row

    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark)
    path = str(tmp_path / "tbl")
    eng.bulk_write(
        spark.createDataFrame([Row(k=1, a="a1", b="b1")]), path, ["k"],
        write_timestamp_micros=1_000,
    )
    eng.bulk_write(
        spark.createDataFrame([(1, None, "b2")], "k bigint, a string, b string"),
        path, ["k"], write_timestamp_micros=2_000,
    )
    row_mode = eng.read_bulk_table(path, ["k"]).collect()[0]
    assert row_mode.a is None  # whole-row winner
    cell_mode = eng.read_bulk_table(path, ["k"], cell_lww=True).collect()[0]
    assert (cell_mode.a, cell_mode.b) == ("a1", "b2")


def test_engine_new_pipeline_surface(spark):
    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "doc_id long, text string",
    )
    assert eng.repetition_stats(docs).count() == 2
    flagged = eng.contamination_overlap(
        docs.filter("doc_id = 1"), docs.filter("doc_id = 2"), min_overlap=1
    )
    assert flagged.count() == 1
    agg = eng.salted_aggregate(
        docs, ["doc_id"], {"n": ("count", "doc_id")}, salt_buckets=4
    )
    assert agg.count() == 2


def test_engine_coordinated_and_bundle_facade(spark, tmp_path):
    from pyspark.sql import Row

    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark)
    df = spark.createDataFrame([Row(id=i, val=f"v{i}") for i in range(20)])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    results = eng.coordinated_bulk_write(
        df, [a, b], ["id"], write_timestamp_micros=1_000
    )
    assert len(results) == 2
    assert eng.read_bulk_table(a, ["id"]).count() == 20

    store = str(tmp_path / "store")
    res = eng.bundle_write(df, store, ["id"], write_timestamp_micros=1_000)
    tbl = str(tmp_path / "restored")
    eng.restore_bundles(res.job_dir, tbl)
    assert eng.read_bulk_table(tbl, ["id"]).count() == 20


def test_engine_dedup_index_facade(spark, tmp_path):
    from pyspark.sql import Row

    from cassandra_analytics_spark.api import Engine
    from cassandra_analytics_spark.operators.dedup_index import LshIndexSpec

    eng = Engine(spark)
    spec = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)
    base = "the quick brown fox jumps over the lazy dog once more " * 2
    seed = spark.createDataFrame([Row(doc_id=1, text=base)])
    batch = spark.createDataFrame([Row(doc_id=2, text=base + "tail")])
    spark.sql("DROP TABLE IF EXISTS api_dedup_idx")
    eng.build_dedup_index(seed, "api_dedup_idx", spec=spec)
    pairs = eng.dedup_ingest_batch(
        "api_dedup_idx", batch, seed, spec=spec, threshold=0.5
    )
    assert {(r.a, r.b) for r in pairs.collect()} == {(1, 2)}
    spark.sql("DROP TABLE api_dedup_idx")


def test_engine_facade_round7_methods(spark, sf_dir):
    """The round-7 facade additions dispatch to the real operators."""
    from pyspark.sql import Row

    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    docs = eng.read_table("documents")
    assert eng.hash_split(docs).select("split").distinct().count() <= 3
    # a real query vector: a zero query scores NULL cosine everywhere
    # and (round-8) unscorable rows are excluded from top-k results
    qv = [float(x) for x in eng.read_table("embeddings").first()["embedding"]]
    assert eng.cosine_topk(eng.read_table("embeddings"), qv, k=3).count() == 3
    left = spark.createDataFrame([Row(k=1, lts=10)])
    right = spark.createDataFrame([Row(k=1, rts=5, v="x")])
    got = eng.asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    assert got[0].v_asof == "x"
    assert eng.chunk_layout(
        docs.limit(10), budget=4096, len_col="n_chars"
    ).count() > 0


def test_facade_minhash_near_dup_pairs_is_confirmed(spark):
    """/code-review r7: the facade's minhash_near_dup_pairs must return
    exactly-confirmed pairs (jaccard >= threshold), not raw bucket
    collisions; the raw stage moved to minhash_candidate_pairs."""
    from pyspark.sql import Row

    from cassandra_analytics_spark.api import Engine
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every evening")
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=base + " x"), Row(doc_id=2, text=base + " y"),
         Row(doc_id=3, text="completely different words " * 6)]
    )
    got = {
        (r.a, r.b): r.jaccard
        for r in Engine.minhash_near_dup_pairs(
            docs, threshold=0.5, num_hashes=16, bands=4
        ).collect()
    }
    want = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5).collect()
    }
    assert got == want and (1, 2) in got
    # the raw candidate stage is still reachable, without jaccard confirm
    cands = Engine.minhash_candidate_pairs(docs, num_hashes=16, bands=4)
    assert set(cands.columns) == {"a", "b", "est_jaccard"}


def test_engine_facade_round8_continuation_methods(spark):
    """The four operators added in the round-8 continuation are reachable
    through the Engine facade."""
    from cassandra_analytics_spark.api import Engine

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.0, 1.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    removed = Engine.semantic_dedup(
        emb, [(0, [1.0, 0.0]), (1, [0.0, 1.0])], threshold=0.95
    ).collect()
    assert [(r.removed, r.kept_rep) for r in removed] == [(1, 0)]

    docs = spark.createDataFrame(
        [(i, "a" if i < 8 else "b", 10) for i in range(10)],
        "doc_id long, lang string, n_chars long",
    )
    mixed = Engine.mixture_sample(docs, {"a": 0.5, "b": 0.5}, size_col="n_chars")
    assert 0 < mixed.count() <= 10

    ranks = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    fused = Engine.reciprocal_rank_fusion({"only": ranks}).collect()
    assert {r.doc_id for r in fused} == {1, 2}

    cleaned = Engine.remove_repeated_segments(
        spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    ).collect()[0]
    assert (cleaned.text, cleaned.n_removed) == ("x y", 1)


def test_engine_facade_ann_and_streaming_surfaces(spark, tmp_path):
    """Round-10: the incremental ANN layer and both streaming collection
    helpers are reachable through the facade — a user of the 'one-stop
    surface' should not need to import operator modules for the round-9
    additions."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark)
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) * 1e-3]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )

    ivf = str(tmp_path / "ivf")
    Engine.build_ivf_index(emb.filter("vec_id < 4"), ivf, num_centroids=2)
    Engine.append_to_ivf_index(emb.filter("vec_id >= 4"), ivf)
    assert spark.read.parquet(ivf).count() == 6
    got = Engine.ivf_knn_join(
        emb.limit(2).select(F.col("vec_id").alias("qid"), "embedding"),
        ivf, k=3, num_probes=2,
    )
    assert got.count() == 6  # 2 queries x top-3

    lsh = str(tmp_path / "lsh")
    Engine.build_ann_index(emb.filter("vec_id < 4"), lsh, num_planes=4)
    Engine.append_to_ann_index(emb.filter("vec_id >= 4"), lsh)
    assert eng.query_ann_index(lsh, [1.0, 0.0], k=3).count() == 3

    # collection helpers return typed empty frames pre-publish
    assert eng.collected_semantic_pairs(str(tmp_path / "nope")).count() == 0
    assert eng.collected_dedup_pairs(str(tmp_path / "nope2")).count() == 0
    assert callable(Engine.run_semantic_dedup_stream)


def test_engine_facade_round11_methods(spark, tmp_path):
    """Round-11 surfaces ride the facade: quantized IVF build/probe
    (quantize=True passes through **kwargs) and the quantized kNN join."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.api import Engine

    eng = Engine(spark)
    emb = spark.createDataFrame(
        [(i, [1.0 + i * 0.1, 2.0 - i * 0.05, float(i)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    ivf = str(tmp_path / "qivf")
    Engine.build_ivf_index(
        emb.filter("vec_id < 6"), ivf, num_centroids=2, quantize=True
    )
    Engine.append_to_ivf_index(emb.filter("vec_id >= 6"), ivf)
    layout = spark.read.parquet(ivf)
    assert layout.count() == 8
    assert layout.filter(F.col("qvec").isNull()).count() == 0

    got = eng.query_ivf_index_quantized(
        ivf, [1.0, 2.0, 0.0], k=3, num_probes=2, rescore_factor=4
    )
    want = eng.query_ivf_index(ivf, [1.0, 2.0, 0.0], k=3, num_probes=2)
    assert [
        (r.vec_id, round(r.cosine_sim, 9)) for r in got.collect()
    ] == [(r.vec_id, round(r.cosine_sim, 9)) for r in want.collect()]

    coded = Engine.ivf_knn_join(
        emb.limit(2).select(F.col("vec_id").alias("qid"), "embedding"),
        ivf, k=3, num_probes=2, use_codes=True,
    )
    assert coded.count() == 6
