"""Second TPC-H-style batch: the remaining dwarf shapes expressible over
the fixture star schema (no partsupp table, so Q2/Q9/Q11/Q16/Q20 are out
of scope; Q4/Q12/Q21/Q22 are adapted to the available columns).

Covers: EXISTS semi-join with a non-equi conjunct (Q4), nation-pair
self-join-on-dimension with a disjunctive pair predicate (Q7), market
share as a conditional-sum ratio (Q8), left-outer count distribution
(Q13), promo revenue ratio (Q14), OR-of-ANDs disjunctive join predicate
(Q19), scalar-subquery threshold + anti-join (Q22), width_bucket
histogramming.

Scale notes (100 TB posture): every dimension side (nation, part-subset,
customer-subset) broadcasts; the lineitem/orders spine is never shuffled
except for its own aggregation key. Q13's left join shuffles on custkey
(maximum-cardinality, uniform). The Q22 scalar subquery is one tiny
aggregate broadcast, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.queries import query
from cassandra_analytics_spark.queries._util import dsum, dsum_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 (adapted: shipdate>orderdate for commit/receipt): "
    "EXISTS → left-semi join with a non-equi conjunct.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: nation-pair volume; the nation dim joins twice under "
    "different aliases, disjunctive pair predicate after both joins.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    pair |= (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ({dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")})
             / ({dsum_sql('volume')}) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: market share = conditional-sum ratio over an 8-way "
    "join; both sums share one aggregation shuffle.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    national = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        base.groupBy("o_year")
        .agg((dsum(national) / dsum(F.col("volume"))).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: left-outer count distribution. Scale note: orders is "
    "pre-aggregated to (custkey, count) BEFORE the outer join — the join "
    "then carries one row per customer instead of one per order (~10x "
    "less shuffle at TPC-H ratios); COUNT(col) null semantics are "
    "recovered with coalesce(cnt, 0). Catalyst does not perform this "
    "aggregate-pushdown-through-outer-join rewrite itself.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o_cnt = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    per_cust = c.join(o_cnt, c.c_custkey == o_cnt.o_custkey, "left_outer").select(
        "c_custkey", F.coalesce(F.col("__cnt"), F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * ({dsum_sql("CASE WHEN p_type LIKE 'PROMO%' "
                              "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
           / ({dsum_sql('l_extendedprice * (1 - l_discount)')}) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14: promo revenue percentage — broadcast part join, "
    "single global aggregate, conditional-sum ratio.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (F.lit(100.0) * dsum(promo) / dsum(disc_price)).alias("promo_revenue")
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19: OR-of-ANDs mixed join/filter predicate; Catalyst "
    "extracts the common p_partkey equi-key so the join stays hash-based.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#11") & sz.between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#20") & sz.between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#13") & sz.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "q22_dormant_customers",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {dsum_sql('c_acctbal')} / COUNT(*) FROM customer
        WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 (adapted: mktsegment for phone country codes, urgent "
    "orders for any orders — the fixture has no order-less customers): "
    "scalar-subquery threshold broadcast + anti-join against orders.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # Deterministic scalar threshold: same fixed-point construction as the
    # oracle, computed once and broadcast into the filter (no collect).
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("__avg_bal"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "stat_moments_lineitem",
    oracle="""
    SELECT l_returnflag,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_disc,
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             / CAST(n AS DOUBLE) AS stddev_pop_qty,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 100.0)
             AS covar_pop_qty_disc
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(qx) AS sx, SUM(dy) AS sy,
             SUM(qx * qx) AS sxx, SUM(dy * dy) AS syy,
             SUM(qx * dy) AS sxy
      FROM (
        SELECT l_returnflag,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qx,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS dy
        FROM lineitem
      ) q
      GROUP BY l_returnflag
    ) m
    ORDER BY l_returnflag
    """,
    doc="Statistical aggregates (corr / stddev_pop / covar_pop) computed "
    "cross-engine-exactly: quantize to integer, sum exact long moments in "
    "one map-side-combined aggregation, apply the closed-form identities "
    "once per group in IEEE doubles. Native corr()/stddev() are "
    "order-sensitive float reductions and cannot hash-match across "
    "engines; the moment form is also the scalable one (single shuffle).",
)
def stat_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qx = F.floor(F.col("l_quantity") + 0.5).cast("long")
    dy = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    m = (
        li.select("l_returnflag", qx.alias("qx"), dy.alias("dy"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("dy") * F.col("dy")).alias("syy"),
            F.sum(F.col("qx") * F.col("dy")).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "l_returnflag",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_disc"
        ),
        (F.sqrt(n * sxx - sx * sx) / n).alias("stddev_pop_qty"),
        ((n * sxy - sx * sy) / (n * n * F.lit(100.0))).alias("covar_pop_qty_disc"),
    ).orderBy("l_returnflag")


@query(
    "acctbal_width_buckets",
    oracle="""
    SELECT bucket, COUNT(*) AS n_cust,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM (
      SELECT c_acctbal,
             LEAST(GREATEST(
               CAST(FLOOR((c_acctbal - 0.0) / ((10000.0 - 0.0) / 20)) AS BIGINT) + 1,
               0), 21) AS bucket
      FROM customer
    ) b
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="width_bucket histogramming (Spark F.width_bucket; DuckDB lacks "
    "the function so the oracle replicates its formula arithmetically).",
)
def acctbal_width_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_acctbal",
            F.width_bucket(F.col("c_acctbal"), F.lit(0.0), F.lit(10000.0), F.lit(20))
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
        )
        .orderBy("bucket")
    )
