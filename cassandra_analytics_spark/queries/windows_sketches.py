"""Window RANGE frames, mergeable HLL sketches, and PII scrubbing.

Three coverage additions:

* ``window_range_frame_revenue`` — a trailing-30-day RANGE window (value
  frame, not row frame). Days are normalized to epoch-day integers so
  both engines use a numeric RANGE frame; the input is pre-aggregated to
  (supplier, day) so the window state is bounded by calendar days, not
  lineitem rows — at 100 TB the frame holds ≤30 longs per supplier
  regardless of row count.
* ``agg_hll_sketch_union`` — Datasketches HLL per nation, merged with
  ``hll_union_agg`` into a global estimate. Sketches are the scale path
  for COUNT DISTINCT at 100 TB: partial sketches merge associatively
  (map-side combine), no exact-distinct shuffle of the key universe.
  Rows-only check (sketch estimates are engine-specific by design).
* ``text_pii_scrub`` — regex redaction (emails, long digit runs) over
  documents with an md5 content digest; patterns restricted to syntax
  with identical semantics in Java regex and RE2 so the oracle is exact.

Reference parity: windows and distinct-count surface are delegated to
Spark by the reference (SURVEY §2.2); text scrubbing belongs to the
north-star training-data pipeline set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.queries import query
from cassandra_analytics_spark.queries._util import M


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_range_frame_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT l_suppkey,
             CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * {M} + 0.5) AS BIGINT)) AS rev_fp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT l_suppkey, ship_day,
           CAST(SUM(rev_fp) OVER (
             PARTITION BY l_suppkey ORDER BY ship_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / {M} AS trailing_30d_revenue
    FROM daily
    ORDER BY l_suppkey, ship_day
    """,
    doc="Trailing-30-day revenue per supplier via a numeric RANGE frame "
    "over pre-aggregated daily rows (bounded window state at any scale).",
)
def window_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    daily = (
        li.select(
            "l_suppkey",
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("ship_day"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * M + F.lit(0.5)
            ).alias("rev_fp"),
        )
        .groupBy("l_suppkey", "ship_day")
        .agg(F.sum("rev_fp").alias("rev_fp"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day")
        .rangeBetween(-30, Window.currentRow)
    )
    return daily.select(
        "l_suppkey",
        "ship_day",
        (F.sum("rev_fp").over(w).cast("double") / M).alias("trailing_30d_revenue"),
    ).orderBy("l_suppkey", "ship_day")


@query(
    "agg_hll_sketch_union",
    oracle=None,  # sketch estimates are engine-specific; rows-only check
    doc="Mergeable HLL distinct-customer sketches per order priority, "
    "unioned into a global estimate — the 100 TB COUNT DISTINCT path "
    "(partial sketches combine map-side; no key-universe shuffle).",
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_prio = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sketch"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    est = per_prio.select(
        "o_orderpriority",
        "n_orders",
        F.hll_sketch_estimate("sketch").alias("approx_customers"),
    )
    total = per_prio.agg(
        F.lit("ALL").alias("o_orderpriority"),
        F.sum("n_orders").alias("n_orders"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_customers"),
    )
    return est.unionByName(total).orderBy("o_orderpriority")


@query(
    "text_pii_scrub",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text,
                 '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{6,}', '<NUM>', 'g')) AS scrubbed_md5,
           CAST(LENGTH(text)
             - LENGTH(regexp_replace(text, '[0-9]{6,}', '', 'g')) AS BIGINT) AS digits_removed
    FROM documents
    ORDER BY doc_id
    """,
    doc="PII-style redaction (emails, ≥6-digit runs) with an md5 digest "
    "of the scrubbed text; single scan, pure JVM regex (no UDF).",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.col("text"), "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"
        ),
        "[0-9]{6,}",
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[0-9]{6,}", ""))
        )
        .cast("bigint")
        .alias("digits_removed"),
    ).orderBy("doc_id")
