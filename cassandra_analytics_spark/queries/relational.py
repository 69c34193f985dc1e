"""Relational operator surface (SURVEY §2.2) — the operators the reference
delegates to Spark SQL and our engine must expose natively.

Each query is a DataFrame program with an equivalent ANSI-SQL oracle.
Aggregates follow the decimal-sum convention from ``_util`` so value hashes
match DuckDB bit-for-bit. Plans: filters/projections sit directly on the
parquet scan (Catalyst pushdown), dimension joins broadcast, top-k compiles
to TakeOrderedAndProject (no global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.queries import query
from cassandra_analytics_spark.queries._util import (
    DEC,
    DEC_SQL,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style scan/filter/agg/join pipeline queries
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: scan+filter+8-agg groupBy; partial agg map-side.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join + agg + top-k (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-07-01"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way join with broadcast dims + colocated-nation predicate.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure pushed-down filter + global agg, no shuffle of data rows.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           ANY_VALUE(c_acctbal) AS c_acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.any_value(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 10000 / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17 shape: correlated per-part average threshold "
    "(decorrelated into an aggregate+join, the plan Catalyst produces for "
    "the subquery form).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (
            F.sum(F.floor(F.col("l_quantity") * 10000 + F.lit(0.5))).cast("double")
            / 10000
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pa_key)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {dsum_sql('l_quantity')} > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: IN-subquery with HAVING, decorrelated to "
    "agg+join; top 20 by price.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Aggregation variants: cube / rollup / grouping sets / distinct / approx
# --------------------------------------------------------------------------


@query(
    "agg_cube_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two group keys (grand totals + margins).",
)
def agg_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


@query(
    "agg_rollup_orders_time",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_year, o_month)
    """,
    doc="ROLLUP over a derived time hierarchy.",
)
def agg_rollup_orders_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        "o_totalprice",
    )
    return o.rollup("o_year", "o_month").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("total")
    )


@query(
    "sql_grouping_sets",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc="GROUPING SETS via the SQL API (spark.sql over registered views).",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "agg_distinct_suppliers",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multiple exact distinct aggregates (expand + two-phase agg).",
)
def agg_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_distinct",
    oracle=None,  # approximate by construction — rows-only check
    doc="approx_count_distinct (HLL++): the 100 TB-scale distinct path.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


# --------------------------------------------------------------------------
# Window functions: ranking, analytic, frames
# --------------------------------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    doc="Per-group top-k via ranking window.",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "window_lag_order_gap",
    oracle="""
    SELECT o_orderkey, o_custkey,
           date_diff('day',
                     CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
    doc="lag() analytic: days since the customer's previous order.",
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("long")
        .alias("gap_days"),
    )


@query(
    "window_running_revenue",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL}))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    """,
    doc="Cumulative frame (running sum per customer).",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL}))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg
    FROM orders
    """,
    doc="Sliding frame (3-order moving average).",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "setop_intersect_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (distinct) of two key sets.",
)
def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    closed = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return auto.intersect(closed)


@query(
    "setop_except_customers",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="EXCEPT (distinct): customers with orders but never urgent ones.",
)
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("c_custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return all_c.subtract(urgent)


@query(
    "setop_union_segments",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="UNION (distinct) of two filtered sets.",
)
def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey", "c_mktsegment")
    return a.union(b).distinct()


# --------------------------------------------------------------------------
# Join types: semi / anti / full outer / cross
# --------------------------------------------------------------------------


@query(
    "join_semi_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="Left-semi join (EXISTS).",
)
def join_semi_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_no_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="Left-anti join (NOT EXISTS): customers without pending orders.",
)
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_full_outer_nation_counts",
    oracle="""
    SELECT COALESCE(cc.nk, sc.nk) AS n_nationkey,
           COALESCE(cc.n_customers, 0) AS n_customers,
           COALESCE(sc.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cc
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
                     FROM supplier GROUP BY s_nationkey) sc
    ON cc.nk = sc.nk
    """,
    doc="Full outer join of two aggregates.",
)
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sc = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    joined = cc.join(sc, "nk", "full_outer")
    return joined.select(
        F.col("nk").alias("n_nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_cross_region_status",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
    doc="Cross join of two small sets (theta-join scaffolding).",
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    st = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


# --------------------------------------------------------------------------
# Scalar function surface: string / date / math / conditional
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTRING(p_name, 1, 5)) AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           CONTAINS(p_type, 'PROMO') AS is_promo,
           LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_padded
    FROM part
    """,
    doc="String functions: upper/substring/length/concat/contains/lpad.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 5)).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.col("p_type").contains("PROMO").alias("is_promo"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS o_day,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus_30d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    doc="Date functions: extract parts, date arithmetic, last_day.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("o_year"),
        F.quarter(d).cast("long").alias("o_quarter"),
        F.month(d).cast("long").alias("o_month"),
        F.dayofmonth(d).cast("long").alias("o_day"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("plus_30d"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(CAST(sqrt(abs(c_acctbal)) AS DECIMAL(28,10))) AS DOUBLE) AS sum_sqrt,
           CAST(SUM(CAST(ln(1 + abs(c_acctbal)) AS DECIMAL(28,10))) AS DOUBLE) AS sum_log,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_round,
           CAST(floor(max(c_acctbal)) AS BIGINT) AS max_floor,
           CAST(ceil(min(c_acctbal)) AS BIGINT) AS min_ceil
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Math functions: sqrt/ln/abs/round/floor/ceil (decimal-stable sums).",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    dec10 = "decimal(28,10)"
    return c.groupBy("c_nationkey").agg(
        F.sum(F.sqrt(F.abs(F.col("c_acctbal"))).cast(dec10)).cast("double").alias("sum_sqrt"),
        F.sum(F.log(1 + F.abs(F.col("c_acctbal"))).cast(dec10)).cast("double").alias("sum_log"),
        F.round(F.sum(F.col("c_acctbal").cast(dec10)).cast("double"), 2).alias("total_round"),
        F.floor(F.max("c_acctbal")).cast("long").alias("max_floor"),
        F.ceil(F.min("c_acctbal")).cast("long").alias("min_ceil"),
    )


@query(
    "case_when_tiering",
    oracle=f"""
    SELECT c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           COUNT(*) AS n_customers,
           {davg_sql('c_acctbal')} AS avg_bal
    FROM customer
    GROUP BY c_mktsegment, tier
    """,
    doc="CASE WHEN bucketing + grouped agg.",
)
def case_when_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.withColumn("tier", tier)
        .groupBy("c_mktsegment", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg(F.col("c_acctbal")).alias("avg_bal"),
        )
    )


@query(
    "pivot_returnflag_status",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot (conditional aggregation) on line status.",
)
def pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity")))
    )


@query(
    "topk_global_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    doc="Global top-k: TakeOrderedAndProject, no full sort shuffle.",
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@query(
    "distinct_part_attrs",
    oracle="SELECT DISTINCT p_brand, p_size FROM part",
    doc="DISTINCT projection.",
)
def distinct_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select("p_brand", "p_size").distinct()


@query(
    "having_big_customers",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
    doc="GROUP BY + HAVING post-aggregation filter.",
)
def having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .filter(F.col("n_orders") >= 12)
    )


# --------------------------------------------------------------------------
# Events: time-bucket aggregation, sessionization, semi-structured props
# --------------------------------------------------------------------------


@query(
    "events_hourly_stats",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    GROUP BY hour, event_type
    """,
    doc="Tumbling 1-hour buckets per event type (streaming-agg batch analog).",
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "streaming_hourly_stats",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY hour, event_type
    """,
    doc="REAL Structured Streaming run, oracle-checked: the events table "
    "streams through a file source (maxFilesPerTrigger batches), a "
    "watermarked tumbling-window aggregation, and a memory sink drained "
    "to completion; the result must equal the batch GROUP BY bit-for-bit "
    "(fixed-point sums are order-independent, so stream batch boundaries "
    "cannot perturb the hash). Kappa-architecture parity as a hard "
    "driver gate, not just a pytest (streaming/events_stream.py).",
)
def streaming_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from cassandra_analytics_spark.streaming.events_stream import (
        events_stream,
        run_stream_to_memory,
    )

    stream = events_stream(spark, sf_dir, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_stream_to_memory(
        agg, query_name=f"drv_stream_{_uuid.uuid4().hex[:8]}"
    )


@query(
    "streaming_sessionize",
    oracle="""
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN LAG(tsu) OVER w IS NULL THEN 1
                    WHEN epoch_us(tsu) - epoch_us(LAG(tsu) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
    )
    GROUP BY user_id
    """,
    doc="Native streaming session windows oracle-checked against the "
    "batch lag-gap sessionization: session_window(ts, 30 min) merges "
    "events whose gaps are under the threshold, which is exactly the "
    "lag-gap>30min session-break rule (boundary-equal gaps do not occur "
    "in the fixture — verified). Runs the REAL streaming state-store "
    "path (complete mode, memory sink) and must match the SQL "
    "sessionization row-for-row.",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from cassandra_analytics_spark.streaming.events_stream import (
        events_stream,
        run_stream_to_memory,
    )

    stream = events_stream(spark, sf_dir, max_files_per_trigger=1)
    sessions = (
        stream.withWatermark("ts", "24 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    drained = run_stream_to_memory(
        sessions, query_name=f"drv_sessions_{_uuid.uuid4().hex[:8]}"
    )
    return drained.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


@query(
    "streaming_dedup_union",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    doc="Streaming exact dedup under duplicate delivery: the events file "
    "stream unioned with itself (every row delivered twice — the "
    "at-least-once replay case) through dropDuplicatesWithinWatermark "
    "on event_id must emit each event exactly once; the oracle is the "
    "original table. Bounded state: one entry per key only until the "
    "watermark passes it (streaming/events_stream.py "
    "dedup_events_stream).",
)
def streaming_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from cassandra_analytics_spark.streaming.events_stream import (
        dedup_events_stream,
        events_stream,
        run_stream_to_memory,
    )

    doubled = events_stream(spark, sf_dir).unionAll(events_stream(spark, sf_dir))
    deduped = dedup_events_stream(doubled, watermark="24 hours").select(
        "event_id", "user_id", "event_type", "value"
    )
    return run_stream_to_memory(
        deduped,
        query_name=f"drv_dedup_{_uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


@query(
    "streaming_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP)
         <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream interval join as a driver gate: purchases matched "
    "to same-user clicks at most 30 min earlier, both sides watermarked "
    "so join state expires (the bounded-state shape a 100 TB/day ingest "
    "needs). Drained to completion the streaming result must equal the "
    "plain SQL interval join row-for-row "
    "(streaming/events_stream.py click_purchase_interval_join).",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from cassandra_analytics_spark.streaming.events_stream import (
        click_purchase_interval_join,
        events_stream,
        run_stream_to_memory,
    )

    stream = events_stream(spark, sf_dir)
    joined = click_purchase_interval_join(stream, events_stream(spark, sf_dir))
    return run_stream_to_memory(
        joined,
        query_name=f"drv_ivjoin_{_uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


@query(
    "streaming_stateful_profile",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value,
           MAX(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState) as a "
    "driver gate: a per-user running profile — count, fixed-point value "
    "sum, last event time — maintained incrementally in Arrow-batched "
    "pandas with one state tuple per user, drained and compared to the "
    "batch GROUP BY. Fixed-point state accumulation makes the emitted "
    "totals independent of batch boundaries and row order, so the "
    "stateful path is hash-exact against SQL "
    "(streaming/stateful.py user_profiles).",
)
def streaming_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from cassandra_analytics_spark.streaming.events_stream import (
        events_stream,
        run_stream_to_memory,
    )
    from cassandra_analytics_spark.streaming.stateful import user_profiles

    stream = events_stream(spark, sf_dir)
    drained = run_stream_to_memory(
        user_profiles(stream),
        query_name=f"drv_profile_{_uuid.uuid4().hex[:8]}",
        output_mode="update",
    )
    # update-mode memory sink appends one row per (user, micro-batch);
    # the profile is monotone in n_events, so the final state is the max
    final = drained.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value", "last_ts")).alias("__s")
    )
    return final.select(
        "user_id",
        F.col("__s.n_events").alias("n_events"),
        F.col("__s.total_value").alias("total_value"),
        F.col("__s.last_ts").alias("last_ts"),
    )


@query(
    "events_sessionize",
    oracle="""
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN LAG(tsu) OVER w IS NULL THEN 1
                    WHEN epoch_us(tsu) - epoch_us(LAG(tsu) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
    )
    GROUP BY user_id
    """,
    doc="Sessionization: lag-gap > 30 min starts a new session.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(prev.isNull(), 1).when(
        F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000, 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_json_extract",
    oracle=f"""
    SELECT CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY k_bucket
    """,
    doc="Semi-structured props: extract numeric field, bucket, aggregate.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.withColumn("k_bucket", k % 10)
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
    )
