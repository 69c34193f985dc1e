"""Bucketed co-located join: no Exchange on either join input."""

from __future__ import annotations

import contextlib
import io

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.sinks.bucketed import bucketed_join, write_bucketed_table


def test_bucketed_join_elides_shuffles(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed_table(
            orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", ["okey"], 8
        )
        write_bucketed_table(
            lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", ["okey"], 8
        )
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["okey"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
