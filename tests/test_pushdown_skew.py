"""F1 pushdown accept-list semantics + skew operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.operators.skew import salted_aggregate, salted_join
from cassandra_analytics_spark.sources.pushdown import (
    PartitionKeyFilter,
    classify_filters,
    scan_with_pk_filter,
)


def test_classify_all_or_nothing():
    # full pk constraint → pushable
    pushed = classify_filters(["pk1", "pk2"], {"pk1": ["a"], "pk2": [1, 2]})
    assert pushed is not None
    assert sorted(pushed.key_combinations()) == [("a", 1), ("a", 2)]
    # partial pk constraint → NOT pushable (DataLayer.java:304-337)
    assert classify_filters(["pk1", "pk2"], {"pk1": ["a"]}) is None
    # clustering-key-only → not pushable
    assert classify_filters(["pk1"], {"ck": [5]}) is None


def test_scan_with_pk_filter_guard(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = scan_with_pk_filter(orders, ["o_orderkey"], {"o_orderkey": [1, 2, 3]})
    assert out.count() == 3
    with pytest.raises(ValueError, match="every partition-key column"):
        scan_with_pk_filter(
            orders, ["o_orderkey"], {"o_custkey": [1]}, require_full_pk=True
        )
    # partial filters still apply post-scan when the guard is off
    loose = scan_with_pk_filter(orders, ["o_orderkey"], {"o_orderstatus": ["F"]})
    assert loose.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_cartesian_key_expansion():
    f = PartitionKeyFilter(values={"a": (1, 2), "b": ("x", "y", "z")})
    assert len(f.key_combinations()) == 6


def test_salted_aggregate_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    rows = [Row(k="hot" if i % 10 else f"cold{i}", v=float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows)
    salted = salted_aggregate(
        df,
        ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")},
        salt_buckets=16,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx")
    )
    got = {r.k: (r.total, r.n, r.mx) for r in salted.collect()}
    want = {r.k: (r.total, r.n, r.mx) for r in plain.collect()}
    assert got == want


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [Row(k=i % 3, pay=f"p{i}") for i in range(3000)]
    )
    right = spark.createDataFrame([Row(k=i, label=f"L{i}") for i in range(5)])
    salted = salted_join(left, right, ["k"], salt_buckets=8)
    plain = left.join(right, ["k"])
    assert salted.count() == plain.count()
    got = sorted((r.k, r.pay, r.label) for r in salted.collect())
    want = sorted((r.k, r.pay, r.label) for r in plain.collect())
    assert got == want


def test_salted_join_rejects_right_preserving_modes(spark):
    """Replicating the small side breaks right/full outer semantics
    (each unmatched replica would emit a null-padded row) — reject
    loudly instead of returning a wrong result."""
    import pytest

    from cassandra_analytics_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(a, b, on=["k"], how=how)
    # left-preserving modes still work and stay duplicate-free
    assert salted_join(a, b, on=["k"], how="left").count() == 1


def test_token_lookups_use_declaration_key_order(spark):
    """Tokens must hash composite keys in partition-key DECLARATION
    order (the tokenize/bulk_writer convention) — alphabetical sorting
    computed wrong tokens whenever declaration order differs."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.functions.tokens import token_column
    from cassandra_analytics_spark.sources.pushdown import (
        classify_filters,
        token_point_lookups,
    )

    # declaration order (user_id, bucket) — lexically reversed
    pk = classify_filters(["user_id", "bucket"], {"user_id": [7], "bucket": [3]})
    [(key, tok)] = token_point_lookups(pk)
    assert key == (7, 3)
    # bigint literals: the lookup path maps python ints to bigint (and
    # xxhash64 is width-sensitive, per the token_point_lookups caveat)
    want = (
        spark.range(1)
        .select(
            token_column(
                F.lit(7).cast("long"), F.lit(3).cast("long")
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    assert tok == want


def test_salted_aggregate_count_skips_nulls(spark):
    """count follows SQL COUNT(col): non-null values only; '*' counts
    rows (ignoring in_col silently overcounted nullable columns)."""
    from cassandra_analytics_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3)], "k string, v int"
    )
    row = salted_aggregate(
        df, ["k"],
        {"n_vals": ("count", "v"), "n_rows": ("count", "*"), "s": ("sum", "v")},
    ).collect()[0]
    assert row.n_vals == 2 and row.n_rows == 3 and row.s == 4


def test_salting_validates_bucket_count(spark):
    """Round-8 probe pass: salt_buckets=0 threw ANSI REMAINDER_BY_ZERO
    deep inside the job (and negative counts only worked by accident);
    both salting entry points now validate eagerly."""
    import pytest

    from cassandra_analytics_spark.operators.skew import (
        salted_aggregate,
        salted_join,
    )

    df = spark.createDataFrame([(1, 10)], "k long, v long")
    small = spark.createDataFrame([(1, "x")], "k long, name string")
    with pytest.raises(ValueError, match="salt_buckets must be >= 1"):
        salted_aggregate(df, ["k"], {"s": ("sum", "v")}, salt_buckets=0)
    with pytest.raises(ValueError, match="salt_buckets must be >= 1"):
        salted_join(df, small, ["k"], salt_buckets=-3)


def test_salt_column_collision_refused(spark):
    """Round-10 probe: a caller's own '__salt' column was silently
    overwritten and dropped by both salted operators — silent data
    loss; refused loudly now."""
    import pytest

    df = spark.createDataFrame(
        [(1, 2, 3)], "k long, v long, __salt long"
    )
    with pytest.raises(ValueError, match="reserves that name"):
        salted_aggregate(df, ["k"], {"s": ("sum", "v")})
    clean = df.drop("__salt")
    with pytest.raises(ValueError, match="reserves that name"):
        salted_join(df, clean, ["k"])
    with pytest.raises(ValueError, match="reserves that name"):
        salted_join(clean, df, ["k"])
