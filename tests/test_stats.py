"""C8 stats hooks: in-job observed metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.stats import observed


def test_observed_scan_metrics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    df, obs = observed(
        orders, extra_metrics=[F.sum("o_totalprice").alias("total_price")]
    )
    n = df.filter(F.col("o_orderstatus") == "F").count()
    metrics = obs.get
    assert metrics["rows_read"] == orders.count()  # observed pre-filter
    assert metrics["first_col_non_null"] == metrics["rows_read"]
    assert metrics["total_price"] > 0
    assert n > 0


def test_partition_sizes_degenerate_inputs(spark):
    """Round-8 continuation probe: empty partition_keys silently produced
    one keyless global row; a misspelled cols entry sized every row 0; a
    non-positive compression ratio emitted negative compressed sizes."""
    import pytest

    from cassandra_analytics_spark.operators.partition_stats import (
        partition_sizes,
        row_size_bytes,
    )

    df = spark.createDataFrame([(1, "ab")], "pk long, s string")
    with pytest.raises(ValueError, match="at least one partition key"):
        partition_sizes(df, [])
    with pytest.raises(ValueError, match="compression_ratio"):
        partition_sizes(df, ["pk"], compression_ratio=0.0)
    with pytest.raises(ValueError, match="not in the DataFrame"):
        df.select(row_size_bytes(df, ["nope"]))


def test_observed_zero_column_frame(spark):
    """observe() on a frame with every column dropped still reports the
    row count instead of IndexError on columns[0] (round-8 probe)."""
    from cassandra_analytics_spark.stats import observed

    df, obs = observed(spark.range(3).drop("id"))
    df.write.mode("overwrite").format("noop").save()
    assert obs.get["rows_read"] == 3


def test_observed_default_names_never_collide(spark):
    """Round-9 executed probe: two observations registered under the same
    name on one session make Observation.get block FOREVER on whichever
    one the listener dropped — and the old fixed default name collided
    with itself on the second observed() call of any session. Default
    names are now auto-unique; both gets must return."""
    from cassandra_analytics_spark.stats import observed

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    o1, ob1 = observed(df)
    o2, ob2 = observed(df)
    assert o1.count() == 2 and o2.count() == 2
    assert ob1.get["rows_read"] == 2
    assert ob2.get["rows_read"] == 2


def test_skew_observation_survives_empty_on_foreign_conf(spark):
    """Round-10 ADVICE (medium): the ngram df-cap and the incremental
    LSH occupancy-cap observations sat on aggregates that are EMPTY in
    the common no-over-cap case — without the AQE empty-relation
    exclusion, the CollectMetrics node vanishes exactly then and
    Observation.get hangs forever. Simulate a foreign session by
    clearing the repo default from the conf; every observe() site must
    re-ensure it (append-merge, preserving the user's own exclusions)
    before the action runs."""
    from pyspark.sql import Observation

    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs
    from cassandra_analytics_spark.operators.dedup_index import (
        LshIndexSpec,
        build_index,
        incremental_candidates,
    )

    key = "spark.sql.adaptive.optimizer.excludedRules"
    rule = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
    saved = spark.conf.get(key, None)
    user_rule = (
        "org.apache.spark.sql.execution.adaptive.OptimizeShuffleWithLocalRead"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
        ],
        "doc_id long, text string",
    )
    try:
        # (1) ngram df-cap path: cap never hit -> hot is EMPTY
        spark.conf.set(key, user_rule)
        obs = Observation()
        pairs = ngram_jaccard_pairs(
            docs, threshold=0.1, max_shingle_df=100, skew_observation=obs
        ).collect()
        assert len(pairs) == 1
        got = obs.get  # would hang forever without the ensure
        assert got["skipped_shingles"] == 0
        merged = spark.conf.get(key)
        assert user_rule in merged.split(",") and rule in merged.split(",")

        # (2) incremental LSH occupancy cap: no over-cap buckets
        spark.conf.set(key, user_rule)
        spec = LshIndexSpec()
        build_index(docs, "t_skew_foreign", spec=spec)
        obs2 = Observation()
        incremental_candidates(
            spark, "t_skew_foreign",
            docs.withColumn("doc_id", F.col("doc_id") + 10),
            spec=spec, skew_observation=obs2,
        ).collect()
        got2 = obs2.get
        assert got2["skipped_buckets"] == 0
        merged2 = spark.conf.get(key)
        assert user_rule in merged2.split(",") and rule in merged2.split(",")
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
        spark.sql("DROP TABLE IF EXISTS t_skew_foreign")
