"""Stage-level timing for the two dedup bench hot spots at sf0.1.

Times each pipeline stage in isolation (noop sink, post-warmup) so the
steady-state tuning work (VERDICT r4 item 3) optimizes the measured
bottleneck instead of a guess.

Usage: python scripts/profile_dedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    shingle_stream,
    simhash_near_dup_pairs,
    simhash_sketches,
)
from cassandra_analytics_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(name, df, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    print(f"{name:45s} {best:7.3f} s")
    return best


def main():
    spark = get_session(app_name="profile_dedup", master="local[32]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")
    d.count()  # warm footers

    print("== corpus ==")
    n = d.count()
    print(f"documents: {n} rows")

    print("== simhash (bench: max_hamming=6, 8 blocks x 2-block keys) ==")
    t("  shingle_stream(n=2)", shingle_stream(d, n=2))
    t("  shingle_stream+xxhash64", shingle_stream(d, n=2).selectExpr("id", "xxhash64(sh) AS h"))
    sk = simhash_sketches(d)
    t("  simhash_sketches", sk)
    t("  full simhash_near_dup_pairs", simhash_near_dup_pairs(d, max_hamming=6, num_blocks=8, blocks_per_key=2))

    print("== minhash (bench: 32 hashes, 8 bands, n=3) ==")
    t("  shingle_stream(n=3)", shingle_stream(d, n=3))
    sigs = minhash_signatures(d, num_hashes=32, shingle_n=3)
    t("  minhash_signatures k=32", sigs)
    t("  minhash_signatures k=16", minhash_signatures(d, num_hashes=16, shingle_n=3))
    t("  full minhash_lsh k=32 b=8", minhash_lsh_candidates(d, num_hashes=32, bands=8, shingle_n=3))
    t("  full minhash_lsh k=16 b=8", minhash_lsh_candidates(d, num_hashes=16, bands=8, shingle_n=3))


if __name__ == "__main__":
    main()
