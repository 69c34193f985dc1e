"""Temporal operator queries: as-of join and bounded range join over the
events table, oracle-checked against DuckDB's native ASOF JOIN and a naive
inequality join respectively."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.operators.asof import asof_join, range_join_pairs
from cassandra_analytics_spark.queries import query


@query(
    "asof_purchase_click",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, r.ts AS click_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') r
    ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    doc="As-of join (sort-based window formulation): for each purchase, the "
    "most recent prior click by the same user. One shuffle on the key; no "
    "inequality join.",
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        suffix="_click",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("ts_click").alias("click_ts")
    )


@query(
    "range_join_error_bursts",
    oracle="""
    SELECT x.user_id,
           x.event_id AS a, y.event_id AS b,
           (epoch_us(CAST(y.ts AS TIMESTAMP)) - epoch_us(CAST(x.ts AS TIMESTAMP)))
               / 1000000.0 AS gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'error') x
    JOIN (SELECT * FROM events WHERE event_type = 'error') y
      ON x.user_id = y.user_id
     AND x.event_id < y.event_id
     AND abs(epoch_us(CAST(x.ts AS TIMESTAMP)) - epoch_us(CAST(y.ts AS TIMESTAMP)))
         <= CAST(21600 AS BIGINT) * 1000000
    """,
    doc="Bounded range join (bucketed equi-join, 3x fan-out): pairs of "
    "errors by the same user within 6 hours.",
)
def range_join_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return range_join_pairs(
        e, key="user_id", ts="ts", id_col="event_id", max_gap_seconds=21600
    )
