"""Build a 10x derived dataset (~sf1) from sf0.1 for scale smoke tests.

The driver ships sf{0.001,0.01,0.1}; PERF.md's scale argument needs one
measured point above sf0.1 to show the headline plans scale linearly and
no join strategy flips at larger stats. This derives "sf1" by unioning 10
key-shifted copies of every fact table — all foreign keys shift together,
so join cardinalities scale exactly 10x; the shared dimensions
(region/nation) stay fixed, like TPC-H itself. Document texts get a
per-copy suffix so the dedup/shingle workload keeps realistic near-dup
(not exact-dup) structure instead of 10 identical corpora.

Usage: python scripts/make_scale10.py [out_dir]   (default .scale10/)
Then:  SPARK_GRAFT_SF_DIR=$PWD/.scale10 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.session import get_session

SRC = "/root/testdata/sf0.1"
COPIES = 10

# columns that must shift together per copy, by table
SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key spaces shared across tables (fk -> same offset as the pk it references)
KEY_SPACE = {
    "l_orderkey": "orderkey",
    "o_orderkey": "orderkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
    "o_custkey": "custkey",
    "c_custkey": "custkey",
    "event_id": "eventid",
    "user_id": "userid",
    "doc_id": "docid",
    "vec_id": "vecid",
}
STATIC_TABLES = ["region", "nation"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="make_scale10")

    # one offset per key space: max+1 over every column in that space
    offsets: dict[str, int] = {}
    for table, cols in SHIFT_KEYS.items():
        df = load_table(spark, SRC, table)
        for c in cols:
            space = KEY_SPACE[c]
            m = df.agg(F.max(c)).collect()[0][0]
            offsets[space] = max(offsets.get(space, 0), int(m) + 1)

    for table in STATIC_TABLES:
        load_table(spark, SRC, table).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        print(f"{table}: copied")

    for table, cols in SHIFT_KEYS.items():
        df = load_table(spark, SRC, table)
        copies = []
        for i in range(COPIES):
            c = df
            for col in cols:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * offsets[KEY_SPACE[col]])).cast("long")
                )
            if table == "documents" and "text" in df.columns:
                # near-dup, not exact-dup, across copies
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rev{i}"))
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        n = spark.read.parquet(os.path.join(out_dir, f"{table}.parquet")).count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
