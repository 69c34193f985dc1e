"""100x soak of the PERSISTED PQ layout (round 13): save_pq_index over
the 200k x 64-d derived corpus (train on a 20k sample, encode
distributed), then drive query_pq_index — per-query wall, stage bytes,
and exactness-under-rescore against brute force for a query sample.

Usage: python scripts/soak_pq_index_100x.py [m] [ks] [n_queries]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_spark.session import get_session
from cassandra_analytics_spark.stage_metrics import delta, stage_totals

SRC = "/root/testdata/sf0.1/embeddings.parquet"
COPIES = 100


def main() -> int:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ks = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from cassandra_analytics_spark.operators.pq import (
        query_pq_index,
        save_pq_index,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
    )

    spark = get_session(
        app_name="soak-pq-index-100x",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(SRC).select("vec_id", "embedding")
    off = int(base.agg(F.max("vec_id")).collect()[0][0]) + 1
    corpus = base.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__copy"),
    ).select(
        (F.col("vec_id") + F.col("__copy") * F.lit(off)).alias("vec_id"),
        "embedding",
    ).repartition(32).cache()
    n = corpus.count()
    queries = [
        [float(x) for x in r["embedding"]]
        for r in base.limit(n_queries).collect()
    ]
    print(f"corpus {n} rows, m={m} ks={ks}, {len(queries)} queries",
          flush=True)

    work = tempfile.mkdtemp(prefix="pq-soak-")
    try:
        path = os.path.join(work, "pq")
        t0 = time.time()
        save_pq_index(corpus, path, m=m, ks=ks, sample_size=20_000,
                      iterations=15, seed=42)
        print(f"layout saved in {time.time() - t0:.1f}s", flush=True)
        layout_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )
        float_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )
        print(f"layout on disk: {layout_bytes:,} bytes "
              f"({layout_bytes / n:.0f} B/vec incl. kept floats)",
              flush=True)

        before = stage_totals(spark)
        t0 = time.time()
        got = []
        for qv in queries:
            got.append({
                (r.vec_id, round(r.cosine_sim, 9))
                for r in query_pq_index(
                    spark, path, qv, k=10, rescore_factor=8
                ).collect()
            })
        wall = time.time() - t0
        d = delta(before, stage_totals(spark))
        print(f"{len(queries)} queries in {wall:.1f}s "
              f"({wall / len(queries):.2f}s/query)", flush=True)
        if d:
            print(f"  input_records={d['input_records']:,} "
                  f"shuffle_write={d['shuffle_write_bytes']:,}", flush=True)

        t0 = time.time()
        exact_hits = 0
        for qv, g in zip(queries, got):
            want = {
                (r.vec_id, round(r.cosine_sim, 9))
                for r in brute_force_topk(corpus, qv, k=10).collect()
            }
            exact_hits += g == want
        print(f"brute-force oracle in {time.time() - t0:.1f}s; "
              f"exact under rescore: {exact_hits}/{len(queries)}",
              flush=True)
        ok = exact_hits == len(queries)
        print("PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
