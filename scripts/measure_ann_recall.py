"""Measure persistent-index ANN recall vs probe count on the driver
fixture (VERDICT r7 item 4): the round-7 note that IVF recall varies
0.5-0.9 across query vectors needs either a multi-probe fix or a pinned
envelope — this script produces the recall-vs-probes curve that decides
which claim stands, over MANY query vectors (min / mean / p10 across
queries, not one anecdote).

Covers both persistent layouts in operators/ann_index.py:
- IVF (nearest-centroid cells, probe the p nearest cells)
- sign-LSH (signature partitions, probe within hamming radius r)

Usage: python scripts/measure_ann_recall.py [sf_dir] [n_queries] [k]
Prints one table row per setting plus a FINAL JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from cassandra_analytics_spark.catalog import load_table
    from cassandra_analytics_spark.operators.ann_index import (
        build_ann_index,
        build_ivf_index,
        query_ann_index,
        query_ivf_index,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
    )
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()

    queries = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]

    exact: dict[int, set] = {}
    for qid, vec in queries:
        exact[qid] = {
            r.vec_id for r in brute_force_topk(emb, vec, k=k).collect()
        }

    root = tempfile.mkdtemp(prefix="ann-recall-")
    ivf_path = os.path.join(root, "ivf")
    lsh_path = os.path.join(root, "lsh")
    num_centroids = 16
    num_planes = 6
    build_ivf_index(emb, ivf_path, num_centroids=num_centroids)
    build_ann_index(emb, lsh_path, num_planes=num_planes)

    def stats(recalls: list[float]) -> dict:
        rs = sorted(recalls)
        return {
            "min": round(rs[0], 3),
            "p10": round(rs[max(0, len(rs) // 10 - 1)], 3),
            "mean": round(sum(rs) / len(rs), 3),
        }

    results = {"sf_dir": sf_dir, "n_corpus": n_corpus, "k": k,
               "n_queries": len(queries), "ivf": {}, "lsh": {}}
    for p in (1, 2, 4, 8, num_centroids):
        recalls = []
        for qid, vec in queries:
            got = {
                r.vec_id
                for r in query_ivf_index(
                    spark, ivf_path, vec, k=k, num_probes=p
                ).collect()
            }
            recalls.append(len(got & exact[qid]) / k)
        s = stats(recalls)
        results["ivf"][f"p{p}"] = s
        print(f"ivf  probes={p:<3} min={s['min']:.3f} p10={s['p10']:.3f} "
              f"mean={s['mean']:.3f}", flush=True)

    for r_h in (0, 1, 2):
        recalls = []
        for qid, vec in queries:
            got = {
                row.vec_id
                for row in query_ann_index(
                    spark, lsh_path, vec, k=k, num_planes=num_planes,
                    probe_hamming=r_h,
                ).collect()
            }
            recalls.append(len(got & exact[qid]) / k)
        s = stats(recalls)
        results["lsh"][f"h{r_h}"] = s
        print(f"lsh  hamming={r_h:<2} min={s['min']:.3f} p10={s['p10']:.3f} "
              f"mean={s['mean']:.3f}", flush=True)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
