"""local_df: Arrow-path local relations (r16) + the r17 empty-frame fix.

The empty path must (a) stay JVM-only — `LocalTableScan <empty>`, never
a pickled-RDD scan that launches a Python worker per action — and
(b) preserve the supplied schema's NULLABILITY: the r16
``range(0).select(lit(None).cast(...))`` form silently made every
column nullable, so a stream bootstrap built from an empty corpus
carried a different nullability contract than the non-empty path
(round-16 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import types as T

from cassandra_analytics_spark.local_data import local_df

_ST = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("vec", T.ArrayType(T.DoubleType(), False), True),
        T.StructField("tag", T.StringType(), True),
    ]
)


def test_local_df_roundtrips_values(spark):
    rows = [(1, [0.5, 2.0], "a"), (2, None, None)]
    got = local_df(spark, rows, _ST).collect()
    want = spark.createDataFrame(rows, _ST).collect()
    assert got == want


def test_empty_local_df_preserves_nullability(spark):
    df = local_df(spark, [], _ST)
    assert df.schema == _ST
    assert df.count() == 0


def test_empty_local_df_is_jvm_only(spark):
    df = local_df(spark, [], _ST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    # a pickled-RDD relation would read "Scan ExistingRDD" and launch a
    # Python worker on every action touching it
    assert "ExistingRDD" not in plan


def test_empty_local_df_matches_nonempty_schema(spark):
    empty = local_df(spark, [], _ST)
    nonempty = local_df(spark, [(1, [1.0], "x")], _ST)
    assert empty.schema == nonempty.schema
    assert empty.unionByName(nonempty).count() == 1
