"""Raw vs RESIDUAL IVF-PQ encoding on the planted-cluster corpus
(round 15 — the measured motivation for encoding="residual"): same
corpus, same TRUE-center coarse codebook, same PQ geometry; compare

- mean stored ``pq_err`` (the per-row measured reconstruction error —
  the direct quantizer-quality metric), and
- APPROX-ONLY recall@k at probe-all (rescore=False isolates the ADC
  ranking quality from the rescore window; probe-all isolates it from
  IVF routing),

per PQ geometry. Clustered data is residual encoding's home turf: the
coarse centroid absorbs the cluster structure, so the codebook spends
its m·ks codewords on the tight residual cloud instead of the spread
of cluster centers.

Usage: python scripts/measure_ivf_pq_residual_recall.py \
           [n_vectors] [n_clusters] [dim] [n_queries] [k]
Prints one row per (geometry, encoding) plus a FINAL JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.measure_ann_recall_clustered import make_clustered_corpus


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 20

    from pyspark.sql import functions as F

    from cassandra_analytics_spark.operators.pq import (
        query_ivf_pq_index,
        save_ivf_pq_index,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
    )
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="ivf-pq-residual-recall")
    spark.sparkContext.setLogLevel("ERROR")

    rows, centers = make_clustered_corpus(n, n_clusters, dim)
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    emb.count()
    centroids = list(enumerate(centers))
    queries = [rows[i][1] for i in range(n_queries)]
    truth = [
        {r.vec_id for r in brute_force_topk(emb, q, k=k).collect()}
        for q in queries
    ]

    out = {}
    work = tempfile.mkdtemp(prefix="ivfpq-res-recall-")
    try:
        for m in (8, 16):
            for enc in ("raw", "residual"):
                path = os.path.join(work, f"{enc}-m{m}")
                save_ivf_pq_index(
                    emb, path, centroids=centroids, m=m, ks=256,
                    sample_size=20_000, iterations=15, seed=42,
                    residuals=True, encoding=enc,
                )
                mean_err = (
                    spark.read.parquet(path)
                    .agg(F.avg("pq_err").alias("e"))
                    .collect()[0]["e"]
                )
                recs = []
                for q, want in zip(queries, truth):
                    got = {
                        r.vec_id
                        for r in query_ivf_pq_index(
                            spark, path, q, k=k,
                            num_probes=n_clusters, rescore=False,
                        ).collect()
                    }
                    recs.append(len(got & want) / k)
                mean = sum(recs) / len(recs)
                out[f"{enc}_m{m}"] = {
                    "mean_recall": round(mean, 4),
                    "min_recall": round(min(recs), 4),
                    "mean_pq_err": round(float(mean_err), 5),
                }
                print(
                    f"{enc:8s} m={m:2d}: mean recall@{k}={mean:.3f} "
                    f"min={min(recs):.3f} mean_pq_err={mean_err:.4f}",
                    flush=True,
                )
        print(json.dumps({"metric": "ivf_pq_residual_recall", **out}))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
