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
