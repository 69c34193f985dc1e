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
