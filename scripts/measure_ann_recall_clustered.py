"""Measure IVF recall on a PLANTED-CLUSTER embedding corpus (VERDICT r8
"what's missing" #3): the round-8 envelope honestly showed recall ≈
probed fraction on the near-random driver fixture, and the API docstring
claims "IVF's real win requires CLUSTERED embeddings" — this script
converts that claim into a measurement by generating a corpus with known
cluster structure and re-running the recall sweep on it.

Fixture: C isotropic Gaussian cluster centers (unit-ish scale), each
with N/C members = center + small Gaussian noise (noise_sigma << 1), so
a vector's true nearest neighbors are its cluster siblings. Two
codebooks are measured:
  - "sampled": the production default (min-wise hash sample of corpus
    vectors — effectively one random member per hit cluster)
  - "centers": the TRUE cluster centers passed via build_ivf_index's
    centroids= hook (stands in for a k-means fit — the upper bound a
    learned codebook could reach)
The random-probing baseline is probes/num_centroids (what reading the
same corpus fraction blindly would recall in expectation).

Usage: python scripts/measure_ann_recall_clustered.py \
           [n_vectors] [n_clusters] [dim] [n_queries] [k]
Prints one table row per setting plus a FINAL JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clustered_corpus(
    n: int, n_clusters: int, dim: int, seed: int = 7, skew: bool = False
):
    """(vec_id, embedding, cluster) rows + the true centers. Balanced:
    vec_id % n_clusters encodes the cluster. ``skew=True`` draws
    cluster membership Zipf-like (cluster c gets weight 1/(c+1)) — the
    realistic shape where a SAMPLED codebook allocates centroids to the
    big head clusters and starves the tail (round 16, the k-means
    gate's second arm)."""
    rng = random.Random(seed)
    centers = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    noise_sigma = 0.05  # << center scale 1.0: siblings are true neighbors
    if skew:
        weights = [1.0 / (c + 1) for c in range(n_clusters)]
        members = rng.choices(range(n_clusters), weights=weights, k=n)
        # guarantee every cluster has at least k members so ground
        # truth top-k stays within the cluster
        for c in range(n_clusters):
            for j in range(30):
                members[(c * 30 + j) % n] = c
    rows = []
    for i in range(n):
        c = members[i] if skew else i % n_clusters
        vec = [x + rng.gauss(0.0, noise_sigma) for x in centers[c]]
        rows.append((i, vec, c))
    return rows, centers


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    skew = len(sys.argv) > 6 and sys.argv[6] == "skew"

    from cassandra_analytics_spark.operators.ann_index import (
        build_ivf_index,
        query_ivf_index,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
        train_coarse_centroids,
    )
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="ann-recall-clustered")
    spark.sparkContext.setLogLevel("ERROR")

    rows, centers = make_clustered_corpus(n, n_clusters, dim, skew=skew)
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    emb.count()

    # queries: one member of each of the first n_queries clusters
    # (balanced: ids 0..n_q-1 hit distinct clusters; skew: pick one
    # member per TAIL cluster — the clusters a sampled codebook
    # starves)
    if skew:
        wanted = list(range(n_clusters - n_queries, n_clusters))
        by_cluster = {}
        for i, _, c in rows:
            if c in wanted and c not in by_cluster:
                by_cluster[c] = i
        queries = [(by_cluster[c], rows[by_cluster[c]][1]) for c in wanted]
    else:
        queries = [(i, rows[i][1]) for i in range(n_queries)]
    exact: dict[int, set] = {}
    for qid, vec in queries:
        exact[qid] = {r.vec_id for r in brute_force_topk(emb, vec, k=k).collect()}

    root = tempfile.mkdtemp(prefix="ann-recall-clustered-")
    num_centroids = n_clusters  # codebook size matches planted structure
    layouts = {
        "sampled": dict(num_centroids=num_centroids),
        "kmeans": dict(
            centroids=train_coarse_centroids(
                emb, num_centroids, sample_size=10_000, iterations=15
            )
        ),
        "centers": dict(centroids=list(enumerate(centers))),
    }
    results = {
        "n_corpus": n, "n_clusters": n_clusters, "dim": dim, "k": k,
        "n_queries": n_queries, "num_centroids": num_centroids,
        "skew": skew,
    }
    for name, kwargs in layouts.items():
        path = os.path.join(root, name)
        build_ivf_index(emb, path, **kwargs)
        results[name] = {}
        for p in (1, 2, 4, 8):
            recalls = []
            for qid, vec in queries:
                got = {
                    r.vec_id
                    for r in query_ivf_index(
                        spark, path, vec, k=k, num_probes=p
                    ).collect()
                }
                recalls.append(len(got & exact[qid]) / k)
            rs = sorted(recalls)
            s = {
                "min": round(rs[0], 3),
                "mean": round(sum(rs) / len(rs), 3),
                "baseline_probed_fraction": round(p / num_centroids, 3),
            }
            results[name][f"p{p}"] = s
            print(
                f"{name:<8} probes={p:<3} min={s['min']:.3f} "
                f"mean={s['mean']:.3f} vs blind-baseline "
                f"{s['baseline_probed_fraction']:.3f}",
                flush=True,
            )

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
