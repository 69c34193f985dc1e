"""Int8 embedding quantization (operators/quantize.py): error bound,
constant vectors, NULL handling, non-finite refusal, storage typing."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.quantize import (
    dequantize_embeddings,
    quantize_embeddings,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_roundtrip_error_bounded_and_types(spark):
    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(50)
    ]
    df = _emb(spark, rows)
    q = quantize_embeddings(df)
    assert q.schema["qvec"].dataType.simpleString() == "array<tinyint>"

    rec = dequantize_embeddings(q, out_col="rec")
    joined = rec.join(df, "vec_id").select(
        "vec_id",
        "embedding_scale",
        F.aggregate(
            F.zip_with(
                "embedding", "rec", lambda x, y: F.abs(x - y)
            ),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        ).alias("max_err"),
    )
    # per-element reconstruction error <= scale/2 (+ double-rounding eps)
    bad = joined.filter(
        F.col("max_err") > F.col("embedding_scale") / 2 + 1e-12
    ).count()
    assert bad == 0
    # codes use the full [-128, 127] range: min element -> -128, max -> 127
    spans = quantize_embeddings(df).select(
        F.array_min("qvec").alias("lo"), F.array_max("qvec").alias("hi")
    ).collect()
    assert all(r.lo == -128 and r.hi == 127 for r in spans)


def test_constant_null_and_nonfinite_vectors(spark):
    # constant vector: scale pins to 1, codes all -128, exact roundtrip
    df = _emb(spark, [(1, [2.5] * 4)])
    q = quantize_embeddings(df)
    row = q.collect()[0]
    assert list(row.qvec) == [-128] * 4 and row.embedding_scale == 1.0
    rec = dequantize_embeddings(q, out_col="rec").collect()[0]
    assert list(rec.rec) == [2.5] * 4

    # NULL vector passes through as NULL codes/meta
    rows = quantize_embeddings(_emb(spark, [(1, None)])).collect()
    assert rows[0].qvec is None

    # NaN / Inf / NULL elements are refused loudly
    for v in ([1.0, float("nan")], [1.0, float("inf")], [1.0, None]):
        with pytest.raises(Exception, match="poisons the scale"):
            quantize_embeddings(_emb(spark, [(1, v)])).collect()


def test_quantized_candidates_float_input(spark):
    """FLOAT-typed storage (the fixture's type) quantizes identically to
    its double cast — elements are promoted before any arithmetic."""
    rows = [(i, [i * 0.5, 1.0 - i * 0.25, 3.0]) for i in range(8)]
    as_double = _emb(spark, rows)
    as_float = as_double.select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    a = {
        (r.vec_id, tuple(r.qvec))
        for r in quantize_embeddings(as_double).collect()
    }
    b = {
        (r.vec_id, tuple(r.qvec))
        for r in quantize_embeddings(as_float).collect()
    }
    assert a == b


def test_quantized_topk_matches_brute_force_with_rescore(spark):
    """Two-phase quantized top-k: with the float column carried, the
    rescored top-k equals brute_force_topk exactly on a random corpus
    (the rescore window absorbs phase-1 rank swaps); without it, the
    approximate scores still agree on membership within quantization
    noise. Validation errors are named."""
    from cassandra_analytics_spark.operators.quantize import quantized_topk
    from cassandra_analytics_spark.operators.similarity import brute_force_topk

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    df = _emb(spark, rows)
    qvec = rows[0][1]
    corpus = df.filter("vec_id <> 0")
    q = quantize_embeddings(corpus, keep_vec=True)

    want = [
        (r.vec_id, round(r.cosine_sim, 9))
        for r in brute_force_topk(corpus, qvec, k=10).collect()
    ]
    got = [
        (r.vec_id, round(r.cosine_sim, 9))
        for r in quantized_topk(
            q, qvec, k=10, vec_col="embedding", rescore_factor=8
        ).collect()
    ]
    assert got == want

    # approx-only mode: top-10 membership overlaps heavily with exact
    approx = {
        r.vec_id for r in quantized_topk(q, qvec, k=10).collect()
    }
    assert len(approx & {v for v, _ in want}) >= 8

    # a NULL-code row (from a NULL vector) never ranks
    with_null = q.unionByName(
        spark.createDataFrame(
            [(999, None, None, None, None)],
            "vec_id long, embedding array<double>, qvec array<tinyint>, "
            "embedding_min double, embedding_scale double",
        )
    )
    assert not [
        r.vec_id
        for r in quantized_topk(
            with_null, qvec, k=300, vec_col="embedding", rescore_factor=1
        ).collect()
        if r.vec_id == 999
    ]

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        quantized_topk(q, qvec, k=0)
    with pytest.raises(ValueError, match="rescore_factor"):
        quantized_topk(q, qvec, k=3, rescore_factor=0)


def test_quantized_topk_dim_and_query_validation(spark):
    """Round-10 probe: a query/code dimension mismatch used to NULL
    every score (zip_with NULL-pads) and return an EMPTY result with no
    hint; non-finite query vectors did the same via a NaN norm. Both are
    named errors now."""
    from cassandra_analytics_spark.operators.quantize import quantized_topk

    df = _emb(spark, [(1, [1.0, 2.0, 3.0]), (2, [0.5, 0.5, 0.5])])
    q = quantize_embeddings(df)
    with pytest.raises(Exception, match="query vector is 2-d"):
        quantized_topk(q, [1.0, 2.0], k=1).collect()
    for bad in ([], [1.0, float("nan")], [1.0, float("inf"), 0.0]):
        with pytest.raises(ValueError, match="non-empty and finite"):
            quantized_topk(q, bad, k=1)
    # matching dims still work
    assert quantized_topk(q, [1.0, 0.0, 0.0], k=2).count() == 2


def test_rescore_mode_join_matches_pushdown_no_collect(spark):
    """VERDICT r10 item 7: the join-based rescore returns the SAME rows
    as the pushdown rescore with no driver-side survivor collect — the
    survivor frame reaches phase 2 as a broadcast join (plan-asserted)."""
    from cassandra_analytics_spark.operators.quantize import quantized_topk

    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(12)]) for i in range(200)]
    df = _emb(spark, rows)
    qvec = rows[0][1]
    q = quantize_embeddings(df.filter("vec_id <> 0"), keep_vec=True)

    push = quantized_topk(
        q, qvec, k=10, vec_col="embedding", rescore_factor=8
    )
    join = quantized_topk(
        q, qvec, k=10, vec_col="embedding", rescore_factor=8,
        rescore_mode="join",
    )
    assert [
        (r.vec_id, round(r.cosine_sim, 9)) for r in push.collect()
    ] == [(r.vec_id, round(r.cosine_sim, 9)) for r in join.collect()]

    plan = join._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    # empty corpus: both modes return empty with the same schema
    empty = quantize_embeddings(
        df.filter("vec_id < 0"), keep_vec=True
    )
    for mode in ("pushdown", "join"):
        out = quantized_topk(
            empty, qvec, k=5, vec_col="embedding", rescore_mode=mode
        )
        assert out.count() == 0
        assert out.columns == ["vec_id", "cosine_sim"]

    with pytest.raises(ValueError, match="rescore_mode"):
        quantized_topk(q, qvec, k=1, rescore_mode="nope")


def test_quantize_guard_survives_column_pruning(spark):
    """Round-10 ADVICE: the NaN/Inf refusal must fire even when the
    consumer selects ONLY the metadata columns — Catalyst prunes the code
    column (and with it an unwrapped guard) out of the plan."""
    df = _emb(spark, [(1, [1.0, float("nan")])])
    q = quantize_embeddings(df)
    for col in ("embedding_min", "embedding_scale"):
        with pytest.raises(Exception, match="poisons the scale"):
            q.select("vec_id", col).collect()


def test_encode_kernel_parity_and_single_eval(spark):
    """r16: the Arrow encode kernel must be BIT-IDENTICAL to the
    quantization_exprs expression form (codes, min, scale — min/scale
    compared by IEEE bits), the guard must raise the same message, and
    the three projected fields must evaluate the kernel ONCE."""
    import random

    import pytest as _pytest

    from cassandra_analytics_spark.operators.quantize import (
        quantization_exprs,
        quantization_kernel_cols,
    )

    rng = random.Random(16)
    rows = []
    for i in range(200):
        dim = rng.choice([1, 3, 16, 64])
        mag = 10 ** rng.randint(-8, 6)
        rows.append((i, [rng.uniform(-1, 1) * mag for _ in range(dim)]))
    rows += [
        (900, None),                        # NULL vector
        (901, []),                          # empty
        (902, [7.25] * 5),                  # constant -> scale 1.0
        (903, [0.0, 255.0]),                # y lands exactly on integers
        (904, [0.0, 0.5, 255.0]),           # y = 0.5009... near boundary
        (905, [-3.0, 3.0]),                 # negatives
        (906, [1e-300, 2e-300]),            # denormal-adjacent scales
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def snap(c, m, s):
        out = {}
        for r in df.select(
            "vec_id", c.alias("q"), m.alias("m"), s.alias("s")
        ).collect():
            out[r.vec_id] = (
                None if r.q is None else tuple(r.q),
                None if r.m is None else r.m.hex(),
                None if r.s is None else r.s.hex(),
            )
        return out

    e = snap(*quantization_exprs("embedding"))
    k = snap(*quantization_kernel_cols("embedding"))
    assert e == k
    assert e[902][0] == (-128,) * 5 and e[902][2] == (1.0).hex()

    # guard parity: NaN/Inf/NULL elements raise the same message
    for bad in ([float("nan"), 1.0], [float("inf")], [None, 1.0]):
        bdf = spark.createDataFrame(
            [(0, bad)], "vec_id long, embedding array<double>"
        )
        c, m, s = quantization_kernel_cols("embedding")
        with _pytest.raises(Exception, match="poisons the scale"):
            bdf.select(c, m, s).collect()

    # single evaluation: three fields from one struct -> ONE
    # ArrowEvalPython in the plan
    c, m, s = quantization_kernel_cols("embedding")
    plan = (
        df.select("vec_id", c.alias("q"), m.alias("m"), s.alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
