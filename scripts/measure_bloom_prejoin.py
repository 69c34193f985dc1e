"""Runtime Bloom-filter pre-join demonstration (guide §3.2, r17
VERDICT item 8).

Spark 3.3+ can inject `bloom_filter_agg` / `might_contain` around an
equi-join so the big (application) side drops non-matching rows BEFORE
its exchange. The injection is threshold-gated on size ESTIMATES:
`spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`
(default 10 MB) and `...applicationSideScanSizeThreshold` (default
10 GB) — at sf0.1 the whole lineitem scan is ~10 MB, so the optimizer
CORRECTLY refuses at bench scale (and the dimension sides broadcast
anyway, so there is no big-side exchange to save). This script lowers
the thresholds and disables auto-broadcast in an ISOLATED session to
prove the mechanism fires on q21's orders⋈lineitem shape, captures the
plan evidence, and A/Bs the wall at sf0.1. The engine's default session
is untouched — the production posture is documented in PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark):
    o_f = (
        spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    lines = li.join(o_f, li.l_orderkey == o_f.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    return lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.count_if("is_late").alias("n_late")
    )


def run(tag: str, extra: dict) -> None:
    builder = (
        SparkSession.builder.appName(f"bloom_{tag}")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    )
    for k, v in extra.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    fired = "might_contain" in plan
    ts = []
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        ts.append(round(time.time() - t0, 3))
    print(f"{tag}: bloom_fired={fired} runs={ts} min={min(ts)}")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17", f"bloom_demo_{tag}.txt",
    )
    with open(out, "w") as f:
        f.write(plan)
    spark.stop()


def main() -> None:
    run("off", {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"})
    run(
        "on",
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # production-scale gates lowered so the mechanism fires on
            # the 10 MB bench fixture (at 100 TB the DEFAULTS fire)
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "50MB",
        },
    )


if __name__ == "__main__":
    main()
