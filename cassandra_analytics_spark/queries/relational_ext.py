"""Second relational coverage batch (SURVEY §2.2): percentiles, multiset
set-ops, unionByName, collect/array functions, map extraction, regex
groups, FILTER-style conditional aggregates, boolean aggregates, unpivot,
date truncation, null-handling functions, IN-list pushdown (F1 analog)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.queries import query
from cassandra_analytics_spark.queries._util import davg_sql, dsum, dsum_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_median_percentiles",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.90) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact median / linear-interpolated percentiles per group.",
)
def agg_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
        F.percentile("l_quantity", F.lit(0.90)).alias("p90_qty"),
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="INTERSECT ALL (multiset semantics).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="EXCEPT ALL (multiset difference).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT c_custkey AS k, c_mktsegment AS seg, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS k, s_name AS seg, 'supplier' AS src FROM supplier
    """,
    doc="unionByName across differently-ordered projections.",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("customer").alias("src"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_name").alias("seg"),
        F.col("s_suppkey").alias("k"),
    )
    return c.unionByName(s)


@query(
    "array_agg_sorted",
    oracle="""
    SELECT n_nationkey, n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
    doc="collect_list → array_sort → array_join (ordered string agg).",
)
def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "explode_embeddings",
    oracle="""
    SELECT vec_id,
           COUNT(*) AS n_elems,
           CAST(MIN(x) AS DOUBLE) AS min_val,
           CAST(MAX(x) AS DOUBLE) AS max_val
    FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
    GROUP BY vec_id
    """,
    doc="Array explode (unnest) + per-row element statistics.",
)
def explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.explode("embedding").alias("x"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_elems"),
            F.min("x").cast("double").alias("min_val"),
            F.max("x").cast("double").alias("max_val"),
        )
    )


@query(
    "map_entry_extraction",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
    FROM events
    GROUP BY user_id
    """,
    doc="Build map<event_type,count> per user, element_at two keys — map "
    "construction + extraction (equivalent to FILTER counts).",
)
def map_entry_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("purchases"),
    )


@query(
    "regexp_extract_groups",
    oracle="""
    SELECT CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT)
               AS brand_num,
           COUNT(*) AS n_parts,
           {davg} AS avg_price
    FROM part
    GROUP BY brand_num
    """.format(davg=davg_sql("p_retailprice")),
    doc="Regex capture-group extraction + aggregation.",
)
def regexp_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_spark.queries._util import davg

    p = _t(spark, sf_dir, "part")
    return (
        p.withColumn(
            "brand_num",
            F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("long"),
        )
        .groupBy("brand_num")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            davg(F.col("p_retailprice")).alias("avg_price"),
        )
    )


@query(
    "conditional_agg_filter",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_closed,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
           {dsum_sql("CASE WHEN o_totalprice > 100000 THEN o_totalprice END")}
               AS big_order_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="FILTER-style conditional aggregation (count_if / conditional sum).",
)
def conditional_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_closed"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        dsum(
            F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
        ).alias("big_order_total"),
    )


@query(
    "bool_aggs",
    oracle="""
    SELECT c_nationkey,
           bool_and(c_acctbal > -999) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_rich,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Boolean aggregates (every/any).",
)
def bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.bool_and(F.col("c_acctbal") > -999).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "unpivot_segment_metrics",
    oracle=f"""
    WITH m AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               {dsum_sql('c_acctbal')} AS total_bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM m
    UNION ALL
    SELECT c_mktsegment, 'total_bal' AS metric, total_bal AS value FROM m
    """,
    doc="Unpivot (wide metrics → long rows).",
)
def unpivot_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    wide = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["n_customers", "total_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "date_trunc_variants",
    oracle="""
    SELECT o_orderkey,
           date_trunc('week', o_orderdate) AS wk,
           date_trunc('month', o_orderdate) AS mo,
           date_trunc('quarter', o_orderdate) AS qt,
           date_trunc('year', o_orderdate) AS yr
    FROM orders
    """,
    doc="date_trunc at week/month/quarter/year granularity.",
)
def date_trunc_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", d).alias("wk"),
        F.date_trunc("month", d).alias("mo"),
        F.date_trunc("quarter", d).alias("qt"),
        F.date_trunc("year", d).alias("yr"),
    )


@query(
    "null_handling_funcs",
    oracle="""
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           COUNT(*) AS n,
           COUNT(NULLIF(o_orderpriority, '5-LOW')) AS n_not_low
    FROM orders
    GROUP BY status_label
    """,
    doc="NULLIF / COALESCE / null-skipping COUNT.",
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "status_label",
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")),
        )
        .groupBy("status_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))).alias(
                "n_not_low"
            ),
        )
    )


@query(
    "array_function_suite",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_elems,
           CAST(list_min(embedding) AS DOUBLE) AS min_elem,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_max(list_slice(embedding, 1, 8)) AS DOUBLE) AS head_max
    FROM embeddings
    """,
    doc="Array-function surface: size/array_min/array_max/array_sort/"
    "element_at/slice over the embedding column.",
)
def array_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("n_elems"),
        F.array_min(emb).cast("double").alias("min_elem"),
        F.array_max(emb).cast("double").alias("max_elem"),
        F.element_at(F.array_sort(emb), 1).cast("double").alias("sorted_first"),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.array_max(F.slice(emb, 1, 8)).cast("double").alias("head_max"),
    )


@query(
    "events_json_struct",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Structured JSON parsing: from_json into a typed struct, aggregate "
    "on the extracted field.",
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.withColumn("props_struct", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("props_struct.k")).cast("long").alias("sum_k"),
        F.max(F.col("props_struct.k")).alias("max_k"),
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey,
           CAST(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal, c_custkey) AS DOUBLE)
               AS bal_pct_rank
    FROM customer
    """,
    doc="percent_rank window (relative standing within segment).",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.percent_rank().over(w).cast("double").alias("bal_pct_rank"),
    )


@query(
    "window_ranking_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS best_order,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Full ranking-function surface: rank/dense_rank/ntile/first_value/"
    "cume_dist over one window definition.",
)
def window_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("o_orderkey").over(w).alias("best_order"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@query(
    "rollup_time_hierarchy",
    oracle=f"""
    SELECT granularity, bucket, COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM (
        SELECT 'hour' AS granularity,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, value
        FROM events
        UNION ALL
        SELECT 'day', date_trunc('day', CAST(ts AS TIMESTAMP)), value FROM events
        UNION ALL
        SELECT 'week', date_trunc('week', CAST(ts AS TIMESTAMP)), value FROM events
    )
    GROUP BY granularity, bucket
    """,
    doc="Hypertable-style continuous rollup: hour/day/week aggregates from "
    "ONE events scan — the hourly level carries exact fixed-point partials "
    "(long count + quantized long sum) and day re-aggregates hour, week "
    "re-aggregates day, since every coarser bucket is a union of whole "
    "finer buckets. The previous 3-scan union read the fact table once "
    "per granularity; at 100 TB this shape reads it once and the rollup "
    "tail runs over #hour-buckets rows.",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_spark.queries._util import M

    e = _t(spark, sf_dir, "events")
    # exact re-aggregable partials: long count + fixed-point long sum.
    # hourly/daily are persisted (#buckets rows — tiny) so the union
    # below replays cached partials instead of re-scanning events once
    # per granularity level.
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * M + F.lit(0.5))).alias("__q"),
        )
        .persist()
    )

    def coarsen(src: DataFrame, g: str) -> DataFrame:
        return src.groupBy(F.date_trunc(g, "bucket").alias("bucket")).agg(
            F.sum("n_events").alias("n_events"), F.sum("__q").alias("__q")
        )

    daily = coarsen(hourly, "day").persist()
    weekly = coarsen(daily, "week")
    levels = [
        lvl.select(
            F.lit(g).alias("granularity"),
            "bucket",
            "n_events",
            (F.col("__q").cast("double") / M).alias("sum_value"),
        )
        for g, lvl in (("hour", hourly), ("day", daily), ("week", weekly))
    ]
    from cassandra_analytics_spark.operators._cache import register_cached

    register_cached(hourly, daily)
    return levels[0].unionByName(levels[1]).unionByName(levels[2])


@query(
    "agg_approx_quantile",
    oracle=None,  # approximate sketch (GK/KLL) — engine-specific by design
    doc="approx_percentile sketch — the quantile path that scales past "
    "exact sorting at 100 TB. Quantiles emitted as scalar columns (p50/"
    "p95/p99), not one array, so the rows-only driver check can "
    "canonicalize the rows (pandas lexsort can't order list cells).",
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return li.groupBy("l_returnflag").agg(
        q[0].alias("p50"),
        q[1].alias("p95"),
        q[2].alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "pk_in_list_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (3, 7, 11, 42, 100)
    """,
    doc="F1 partition-key EqualTo/In pushdown analog: IN-list on the "
    "partition key reaches the parquet scan as PushedFilters "
    "(DataLayer.java:304-337 accept-list semantics).",
)
def pk_in_list_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey").isin(3, 7, 11, 42, 100)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
