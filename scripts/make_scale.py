"""Build an Nx derived dataset from sf0.1 for scale smoke tests.

The driver ships sf{0.001,0.01,0.1}; PERF.md's scale argument needs
measured points above sf0.1 to show the headline plans scale linearly
and no join strategy flips at larger stats. This derives "sfN/10" by
expanding every fact table into N key-shifted copies — all foreign keys
shift together, so join cardinalities scale exactly Nx; the shared
dimensions (region/nation) stay fixed, like TPC-H itself. Document texts
get a per-copy suffix so the dedup/shingle workload keeps realistic
near-dup (not exact-dup) structure instead of N identical corpora.

The expansion is a single `explode(sequence(0, N-1))` per table — one
whole-stage-codegen pass regardless of N — rather than an N-way union,
so building the 100x set costs the same plan as the 10x set.

Usage: python scripts/make_scale.py OUT_DIR COPIES
Then:  SPARK_GRAFT_SF_DIR=$OUT_DIR python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.session import get_session

SRC = "/root/testdata/sf0.1"

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


def build(out_dir: str, copies: int, out_partitions: int | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name=f"make_scale{copies}")
    if out_partitions is None:
        # keep output file sizes roughly constant as copies grows
        out_partitions = max(32, 32 * copies // 10)

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
        scaled = df.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        for col in cols:
            scaled = scaled.withColumn(
                col,
                (
                    F.col(col)
                    + F.col("__copy") * F.lit(offsets[KEY_SPACE[col]])
                ).cast("long"),
            )
        if table == "documents" and "text" in df.columns:
            # near-dup, not exact-dup, across copies
            scaled = scaled.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" rev"), F.col("__copy").cast("string")),
            )
        scaled = scaled.drop("__copy")
        scaled.repartition(out_partitions).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        n = spark.read.parquet(os.path.join(out_dir, f"{table}.parquet")).count()
        print(f"{table}: {n} rows")


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    build(sys.argv[1], int(sys.argv[2]))


if __name__ == "__main__":
    main()
