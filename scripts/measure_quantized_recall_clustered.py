"""Quantized-probe recall on the PLANTED-CLUSTER corpus (round 11): the
round-9 measurement proved IVF's win case on clustered embeddings; this
re-runs the same sweep with the QUANTIZED layout and
``query_ivf_index_quantized`` so the byte-reduced probe's recall is
measured probe-for-probe against the float probe — quantization noise
must not cost recall once the rescore window absorbs phase-1 swaps.

Usage: python scripts/measure_quantized_recall_clustered.py \
           [n_vectors] [n_clusters] [dim] [n_queries] [k]
Prints one row per probe count plus a FINAL JSON line for PERF.md.
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

    from cassandra_analytics_spark.operators.ann_index import (
        build_ivf_index,
        query_ivf_index,
        query_ivf_index_quantized,
    )
    from cassandra_analytics_spark.operators.similarity import brute_force_topk
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="quantized-recall-clustered")
    spark.sparkContext.setLogLevel("ERROR")

    rows, centers = make_clustered_corpus(n, n_clusters, dim)
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    emb.count()

    queries = [(i, rows[i][1]) for i in range(n_queries)]
    exact: dict[int, set] = {}
    for qid, vec in queries:
        exact[qid] = {r.vec_id for r in brute_force_topk(emb, vec, k=k).collect()}

    root = tempfile.mkdtemp(prefix="q-recall-clustered-")
    path = os.path.join(root, "qivf")
    build_ivf_index(emb, path, num_centroids=n_clusters, quantize=True)
    results = {
        "n_corpus": n, "n_clusters": n_clusters, "dim": dim, "k": k,
        "n_queries": n_queries, "rescore_factor": 8,
    }
    try:
        for p in (1, 2, 4, 8):
            rec_f, rec_q = [], []
            for qid, vec in queries:
                got_f = {
                    r.vec_id
                    for r in query_ivf_index(
                        spark, path, vec, k=k, num_probes=p
                    ).collect()
                }
                got_q = {
                    r.vec_id
                    for r in query_ivf_index_quantized(
                        spark, path, vec, k=k, num_probes=p,
                        rescore_factor=8,
                    ).collect()
                }
                rec_f.append(len(got_f & exact[qid]) / k)
                rec_q.append(len(got_q & exact[qid]) / k)
            s = {
                "float_mean": round(sum(rec_f) / len(rec_f), 3),
                "quant_mean": round(sum(rec_q) / len(rec_q), 3),
                "quant_min": round(min(rec_q), 3),
            }
            results[f"p{p}"] = s
            print(
                f"probes={p:<3} float mean={s['float_mean']:.3f}  "
                f"quantized mean={s['quant_mean']:.3f} "
                f"min={s['quant_min']:.3f}",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
