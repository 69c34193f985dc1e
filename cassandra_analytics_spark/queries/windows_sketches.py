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

from cassandra_analytics_spark.catalog import load_table, spread_scan
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
        # ONE exchange serves both the (suppkey, day) aggregate and the
        # per-suppkey window (guide §2.4: operations keyed the same way
        # share the partitioning): hash-repartitioning by l_suppkey
        # satisfies the aggregate's clustered distribution AND the
        # window's, so the agg's own (suppkey, day) exchange disappears.
        # Map-side partial aggregation is a poor trade here — (suppkey,
        # day) granularity barely collapses lineitem rows (~1 line per
        # supplier-day), so the raw-row exchange carries ≈ the same
        # bytes the partial-agg exchange did, one hop earlier (r16;
        # plan diff: 3 Exchange → 2 in plans/r16).
        .repartition("l_suppkey")
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
    # scan-dominated single-pass shape (three regex passes per doc):
    # cost-gated spread (r17 A/B — 4.5x at 16x scale, self-disables
    # below the rows floor so the bench-scale plan is the raw scan)
    d = spread_scan(spark, sf_dir, "documents", columns=("doc_id", "text"))
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


# --------------------------------------------------------------------------
# Bounded-verdict sketch oracles (VERDICT r6 item 4)
#
# The raw sketch queries (agg_approx_distinct, agg_approx_quantile,
# agg_hll_sketch_union) stay rows-only because their estimates are
# engine-specific by construction. These companions convert the sketch
# claim itself into a driver-hashable fact: Spark computes BOTH the
# sketch estimate and the exact value and emits a within-bounds BOOLEAN
# (estimate vs its documented error bound); the DuckDB oracle recomputes
# the same exact values and asserts TRUE. The hash matches iff the
# sketch really honored its bound — the same pattern that made the four
# LSH confirmed-pair queries oracle-exact in r6.
#
# Bounds are ~5x the documented one-standard-deviation error so the
# verdict is deterministic in practice while still refuting a broken
# sketch (a 5-sigma miss at every gate SF would mean the implementation,
# not the luck, is wrong). The exact aggregates exist only to judge the
# sketch; at 100 TB one runs the raw sketch queries, not these.
# --------------------------------------------------------------------------


@query(
    "agg_approx_distinct_bounded",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_ok,
           TRUE AS orders_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++, rsd=0.01) judged against the exact "
    "distinct count: within_bounds = |approx - exact| <= 5*rsd*exact. "
    "Oracle asserts TRUE, so the row hash-matches iff the sketch honors "
    "its documented error bound.",
)
def agg_approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rsd = 0.01
    # Keep the approx aggregates in their OWN aggregation: combined with
    # two exact countDistincts, Catalyst routes partial_approx_count_
    # distinct through the multi-distinct Expand, allocating an HLL++
    # buffer per (flag, partkey, orderkey, gid) group — one sketch per
    # ~row (measured 125 s at sf0.1; split form 8 s). The split costs one
    # extra column-pruned scan and a 3-row broadcast join.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
    )
    agg = exact.join(F.broadcast(approx), "l_returnflag")
    tol = 5 * rsd

    def ok(approx_c: str, exact_c: str):  # |approx - exact| <= tol * exact
        return (
            F.abs(F.col(approx_c) - F.col(exact_c))
            <= F.lit(tol) * F.col(exact_c)
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        ok("approx_parts", "exact_parts").alias("parts_ok"),
        ok("approx_orders", "exact_orders").alias("orders_ok"),
    )


@query(
    "agg_approx_quantile_bounded",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="percentile_approx (accuracy=10000, guaranteed rank error "
    "1/accuracy) judged against exact interpolated percentiles at "
    "p +/- 0.003 (30x the guaranteed rank error, absorbing the "
    "element-vs-interpolated rank offset): pXX_ok = exact(p-eps) <= "
    "approx(p) <= exact(p+eps). Oracle asserts TRUE.",
)
def agg_approx_quantile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    eps = 0.003
    probs = [0.5, 0.95, 0.99]
    ap = F.percentile_approx("l_extendedprice", probs, 10000)
    lo = F.percentile(
        "l_extendedprice", F.array(*[F.lit(max(p - eps, 0.0)) for p in probs])
    )
    hi = F.percentile(
        "l_extendedprice", F.array(*[F.lit(min(p + eps, 1.0)) for p in probs])
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ap.alias("ap"),
        lo.alias("lo"),
        hi.alias("hi"),
    )
    cols = [F.col("l_returnflag"), F.col("n")]
    for i, name in enumerate(("p50_ok", "p95_ok", "p99_ok")):
        cols.append(
            (
                (F.col("lo")[i] <= F.col("ap")[i])
                & (F.col("ap")[i] <= F.col("hi")[i])
            ).alias(name)
        )
    return agg.select(*cols)


@query(
    "agg_hll_sketch_union_bounded",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS customers_ok
    FROM orders
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL' AS o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS customers_ok
    FROM orders
    """,
    doc="Datasketches HLL (default lgConfigK=12, rsd~1.6%) judged against "
    "exact distinct customers per priority AND for the hll_union_agg "
    "merge of all per-priority sketches (the 'ALL' row — the mergeability "
    "claim itself is under test): customers_ok = |est - exact| <= "
    "0.08*exact (~5 sigma). Oracle asserts TRUE.",
)
def agg_hll_sketch_union_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    tol = 0.08

    def ok(est, exact):
        return F.abs(est - exact) <= F.lit(tol) * exact

    # eager checkpoint: per_prio feeds BOTH the per-priority rows and the
    # hll_union_agg merge — left lazy, the orders scan + sketch build +
    # countDistinct would run once per consumer (/code-review r7); the
    # materialized frame is 5 rows
    per_prio = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.hll_sketch_agg("o_custkey").alias("sketch"),
        )
        .localCheckpoint(eager=True)
    )
    est = per_prio.select(
        "o_orderpriority",
        "n_orders",
        "exact_customers",
        ok(
            F.hll_sketch_estimate("sketch"), F.col("exact_customers")
        ).alias("customers_ok"),
    )
    # The ALL row judges the UNION of the per-priority sketches against
    # the exact global distinct — i.e. merge correctness, not just each
    # partial sketch. Exact global distinct comes from a second tiny agg
    # over orders (one extra scan of one int column at gate SF).
    total_exact = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    total_est = per_prio.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )
    total = total_exact.crossJoin(total_est).select(
        F.lit("ALL").alias("o_orderpriority"),
        "n_orders",
        "exact_customers",
        ok(F.col("est"), F.col("exact_customers")).alias("customers_ok"),
    )
    return est.unionByName(total)
