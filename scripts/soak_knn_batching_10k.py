"""Soak the kNN join's query BATCHING at its design point (round 15 —
VERDICT r14 item 6 turned the documented ~10k-query LUT ceiling into
code): 10,000 queries against the 100x corpus (200k x 64-d) over an
IVF-PQ layout, where the per-query m·ks ADC LUT payload would total
~320 MB of broadcast unbatched. The auto ceiling (64 MB of LUT per
chunk → 2,048 queries at m=16/ks=256) splits this into 5 chunks.

Checks:
- the batched 10k-query join COMPLETES (the unbatched form is exactly
  the shape the r13/r14 soaks documented as past the comfort zone);
- CHUNK COMPOSABILITY at scale: a 200-query subset run through its own
  small (single-chunk) join returns per-query top-k IDENTICAL to those
  queries' rows inside the batched 10k run — chunking can never change
  a query's result;
- every query got k rows; wall + REST byte fingerprint recorded.

Usage: python scripts/soak_knn_batching_10k.py
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
N_QUERIES = 10_000
NUM_CENTROIDS = 128
K = 10
SUBSET = 200


def main() -> int:
    from cassandra_analytics_spark.operators.ann_index import ivf_knn_join
    from cassandra_analytics_spark.operators.pq import save_ivf_pq_index

    spark = get_session(
        app_name="soak-knn-batching-10k",
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
    ).repartition(32)  # the 1-file source would otherwise collapse to
    # ONE partition and single-thread the whole build (the r14 soak's
    # documented pitfall)
    corpus = corpus.cache()
    n = corpus.count()
    # 10k distinct query vectors: the 64-d fixture has ~2k distinct
    # rows, so tile with a per-qid perturbation for unique vectors
    queries = (
        base.limit(2000)
        .select("vec_id", "embedding")
        .crossJoin(spark.range(5).withColumnRenamed("id", "__rep"))
        .select(
            (F.col("vec_id") * 5 + F.col("__rep")).alias("qid"),
            F.transform(
                "embedding",
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + F.pmod(
                        F.xxhash64(i, F.col("__rep"), F.lit(3)),
                        F.lit(100),
                    ).cast("double")
                    / F.lit(1000.0)
                ),
            ).alias("embedding"),
        )
        .limit(N_QUERIES)
    )
    nq = queries.count()
    print(f"corpus {n} rows, {nq} queries, k={NUM_CENTROIDS} cells", flush=True)

    work = tempfile.mkdtemp(prefix="knn-batching-10k-")
    path = os.path.join(work, "ivfpq")
    try:
        t0 = time.time()
        save_ivf_pq_index(
            corpus, path, num_centroids=NUM_CENTROIDS, m=16, ks=256,
            sample_size=20_000, iterations=15, seed=42,
        )
        print(f"layout built in {time.time() - t0:.1f}s", flush=True)

        before = stage_totals(spark)
        t0 = time.time()
        full = (
            ivf_knn_join(
                queries, path, k=K, num_probes=8, use_pq=True,
                rescore_factor=8,
            )
            .localCheckpoint(eager=True)
        )
        n_rows = full.count()
        wall = time.time() - t0
        d = delta(before, stage_totals(spark))
        per_q = full.groupBy("qid").count()
        n_full_q = per_q.filter(F.col("count") == K).count()
        print(
            f"batched 10k join: {wall:.1f}s, {n_rows} rows, "
            f"{n_full_q}/{nq} queries with k={K} rows",
            flush=True,
        )
        if d:
            for k_, v in sorted(d.items()):
                print(f"  {k_}: {v:,}", flush=True)

        # chunk composability: the subset's own single-chunk join must
        # equal its rows inside the batched run, per query, exactly
        sub_q = queries.filter(F.col("qid") < SUBSET)
        sub = ivf_knn_join(
            sub_q, path, k=K, num_probes=8, use_pq=True, rescore_factor=8,
        )
        key = lambda r: (r.qid, r.vec_id, round(r.cosine_sim, 9))  # noqa: E731
        want = sorted(map(key, sub.collect()))
        got = sorted(
            map(key, full.filter(F.col("qid") < SUBSET).collect())
        )
        same = got == want
        print(
            f"subset composability ({SUBSET} queries): "
            f"{'IDENTICAL' if same else 'MISMATCH'} "
            f"({len(got)} vs {len(want)} rows)",
            flush=True,
        )
        ok = same and n_full_q == nq
        print("PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
