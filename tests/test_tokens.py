"""Token partitioning helpers (M4/F2/W2 analogs)."""

from __future__ import annotations

from cassandra_analytics_spark.functions.tokens import (
    MAX_TOKEN,
    MIN_TOKEN,
    _murmur3_64,
    token_range_splits,
    tokenize,
)


def test_token_range_splits_cover_ring():
    for n in (1, 3, 32, 100):
        splits = token_range_splits(n)
        assert len(splits) == n
        assert splits[0][0] == MIN_TOKEN
        assert splits[-1][1] == MAX_TOKEN
        for (s1, e1), (s2, _) in zip(splits, splits[1:]):
            assert s2 == e1 + 1  # contiguous, non-overlapping


def test_murmur3_known_values():
    # murmur3 x64 128 of empty input with seed 0 is 0 (published vector)
    assert _murmur3_64(b"") == 0
    # deterministic + full-range signed
    t = _murmur3_64(b"hello")
    assert t == _murmur3_64(b"hello")
    assert MIN_TOKEN <= t <= MAX_TOKEN
    assert _murmur3_64(b"hello") != _murmur3_64(b"hellp")


def test_murmur3_cassandra_golden_tokens():
    """Golden values published in Cassandra documentation/tutorials for
    `SELECT token(...)` under Murmur3Partitioner — these exercise the
    sign-extended-tail quirk (MurmurHash.java tail switch) that canonical
    murmur3 implementations get wrong."""
    from cassandra_analytics_spark.functions.tokens import murmur3_token

    # int (4-byte big-endian) partition keys
    assert murmur3_token((1).to_bytes(4, "big", signed=True)) == -4069959284402364209
    assert murmur3_token((2).to_bytes(4, "big", signed=True)) == -3248873570005575792


def test_composite_key_tokens():
    from cassandra_analytics_spark.functions.tokens import (
        composite_key_bytes,
        murmur3_token,
        murmur3_token_for_key,
        serialize_cql_value,
    )

    # single-component key: raw bytes (no framing)
    assert composite_key_bytes([b"abc"]) == b"abc"
    assert murmur3_token_for_key([1], ["int"]) == -4069959284402364209
    # composite framing: <len:2><bytes><0x00> per component
    framed = composite_key_bytes([b"ab", b"\x01"])
    assert framed == b"\x00\x02ab\x00" + b"\x00\x01\x01\x00"
    # composite token is deterministic and differs from concatenation
    t1 = murmur3_token_for_key(["x", 7], ["text", "int"])
    assert t1 == murmur3_token_for_key(["x", 7], ["text", "int"])
    assert t1 != murmur3_token(b"x" + (7).to_bytes(4, "big"))
    # type serializations
    assert serialize_cql_value(True, "boolean") == b"\x01"
    assert serialize_cql_value("hi", "text") == b"hi"
    assert len(serialize_cql_value("123e4567-e89b-12d3-a456-426614174000", "uuid")) == 16


def test_murmur3_spread():
    tokens = [_murmur3_64(i.to_bytes(8, "big", signed=True)) for i in range(1000)]
    assert len(set(tokens)) == 1000
    negative = sum(1 for t in tokens if t < 0)
    assert 300 < negative < 700  # roughly balanced over the signed range


def test_tokenize_uniform_buckets(spark):
    df = spark.range(10_000)
    toks = tokenize(df, ["id"])
    from pyspark.sql import functions as F

    buckets = (
        toks.withColumn("b", F.pmod("token", F.lit(16)))
        .groupBy("b")
        .count()
        .collect()
    )
    assert len(buckets) == 16
    counts = [r["count"] for r in buckets]
    assert max(counts) < 2 * min(counts)  # no pathological skew


def test_murmur3_pandas_udf_matches_python(spark):
    from cassandra_analytics_spark.functions.tokens import murmur3_token_for_long

    df = spark.range(100)
    got = {
        r.id: r.token for r in murmur3_token_for_long(df, "id").collect()
    }
    for i in range(100):
        assert got[i] == _murmur3_64(int(i).to_bytes(8, "big", signed=True))


def test_assign_token_range_full_ring(spark):
    """Regression: tokens >= 0 overflowed the long rebase (ANSI
    ARITHMETIC_OVERFLOW); the decimal form must bucket the entire ring
    consistently with token_range_splits boundaries."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.functions.tokens import (
        MAX_TOKEN,
        MIN_TOKEN,
        assign_token_range,
        token_range_splits,
    )

    for n in (1, 3, 32):
        splits = token_range_splits(n)
        probe = []
        for i, (start, end) in enumerate(splits):
            probe += [(start, i), (end, i), ((start + end) // 2, i)]
        probe += [(0, None), (MAX_TOKEN, n - 1), (MIN_TOKEN, 0), (1, None), (-1, None)]
        df = spark.createDataFrame(
            [(t,) for t, _ in probe], "token long"
        ).withColumn("idx", assign_token_range(F.col("token"), n))
        got = {r.token: r.idx for r in df.collect()}
        for t, expect in probe:
            # every token must fall in the split whose bounds contain it
            s, e = splits[got[t]]
            assert s <= t <= e, f"n={n} token={t} -> idx {got[t]} [{s},{e}]"
            if expect is not None:
                assert got[t] == expect, f"n={n} token={t}"


def test_degenerate_token_inputs_fail_loudly(spark):
    """Round-8 continuation probe batch over the token layer: every
    degenerate input used to fail with a context-free error deep inside a
    worker — or worse, silently produce a WRONG answer (a NULL token
    landed in the LAST partition because F.least skips NULLs; a negative
    num_splits returned a negative index for every row)."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.functions.tokens import (
        assign_token_range,
        composite_key_bytes,
        murmur3_token_for_long,
        serialize_cql_value,
        tokenize,
    )

    for bad in (0, -3):
        with pytest.raises(ValueError, match="num_splits"):
            assign_token_range(F.lit(5), bad)
    # NULL token propagates NULL, never a real partition index
    row = spark.range(1).select(
        assign_token_range(F.lit(None).cast("long"), 4).alias("r")
    ).collect()[0]
    assert row.r is None

    df = spark.createDataFrame([(1,), (None,)], "k bigint")
    with pytest.raises(Exception, match="rejects NULL partition keys"):
        murmur3_token_for_long(df, "k").collect()

    with pytest.raises(ValueError, match="rejects NULL partition keys"):
        serialize_cql_value(None, "bigint")
    with pytest.raises(ValueError, match="does not fit CQL type"):
        serialize_cql_value(2**40, "int")
    with pytest.raises(ValueError, match="at least one component"):
        composite_key_bytes([])
    with pytest.raises(ValueError, match="at least one partition-key column"):
        tokenize(df, [])


def test_user_profiles_missing_columns_fail_at_plan_time(spark):
    """A stream without the contract columns must fail when the operator
    is APPLIED, naming the columns — not KeyError inside a streaming
    worker after the query starts (round-8 continuation probe)."""
    import pytest

    from cassandra_analytics_spark.streaming.stateful import user_profiles

    with pytest.raises(ValueError, match="missing \\['ts'\\]"):
        user_profiles(spark.createDataFrame([(1, 2.0)], "user_id long, value double"))
