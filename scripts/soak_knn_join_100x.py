"""100x soak of the index-accelerated kNN JOIN at a REAL query-set size
(VERDICT r12 item 8: the r11 soak used 8 queries; this runs 1,000) —
pins the routing-table broadcast and the per-query top-k window at
scale, float and use_codes paths, with exactness at probe-all checked
against the brute-force join for every query.

The routing table is the scaling hazard this soak watches: it carries
(qid, cell, query_vec, norm, sum) per PROBED cell, so its size is
n_queries x num_probes x ~(8d + 24) bytes — at 1k queries, 64-d,
probe-all over 128 cells that is ~70 MB broadcast. The soak records it
so the window where probe-all stops being broadcastable is measured,
not guessed.

Usage: python scripts/soak_knn_join_100x.py
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
N_QUERIES = 1000
NUM_CENTROIDS = 128
K = 10


def main() -> int:
    from cassandra_analytics_spark.operators.ann_index import (
        build_ivf_index,
        ivf_knn_join,
    )
    from cassandra_analytics_spark.operators.similarity import knn_join

    spark = get_session(
        app_name="soak-knn-join-100x",
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
    ).repartition(32)  # the 1-file source would otherwise explode into
    # ONE partition and single-thread every downstream scan
    corpus = corpus.cache()
    n = corpus.count()
    # 1k queries: the corpus's own vectors (distinct embeddings so the
    # duplicate structure doesn't collapse the ranking), perturbation-free
    queries = (
        base.limit(N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    nq = queries.count()
    print(f"corpus {n} rows, {nq} queries, {NUM_CENTROIDS} cells",
          flush=True)

    work = tempfile.mkdtemp(prefix="knn-soak-")
    try:
        path = os.path.join(work, "ivf")
        t0 = time.time()
        build_ivf_index(
            corpus, path, num_centroids=NUM_CENTROIDS,
            assignment="vectorized", quantize=True,
        )
        print(f"index built in {time.time() - t0:.1f}s", flush=True)

        runs = {}
        for label, kw in (
            ("float", {}),
            ("use_codes", {"use_codes": True}),
        ):
            before = stage_totals(spark)
            t0 = time.time()
            got = {
                (r.qid, r.vec_id, round(r.cosine_sim, 9))
                for r in ivf_knn_join(
                    queries, path, k=K, num_probes=NUM_CENTROIDS, **kw
                ).collect()
            }
            wall = time.time() - t0
            d = delta(before, stage_totals(spark))
            runs[label] = (got, wall, d)
            print(f"[{label}] probe-all kNN join: {wall:.1f}s "
                  f"({len(got)} result rows)", flush=True)
            if d:
                for key in ("input_bytes", "shuffle_write_bytes"):
                    print(f"  [{label}] {key}: {d[key]:,}", flush=True)

        t0 = time.time()
        want = {
            (r.qid, r.vec_id, round(r.cosine_sim, 9))
            for r in knn_join(queries, corpus, k=K, query_id="qid").collect()
        }
        print(f"brute-force oracle in {time.time() - t0:.1f}s", flush=True)

        ok = True
        for label, (got, _, _) in runs.items():
            match = got == want
            ok = ok and match
            print(f"[{label}] exact vs brute force at probe-all: {match}",
                  flush=True)
        print("PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
