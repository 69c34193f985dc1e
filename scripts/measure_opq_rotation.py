"""OPQ-style rotation ablation for PQ (round 14, VERDICT r13 item 7,
stretch): does a single orthogonal rotation before the subspace split
buy m=16 recall back toward >=0.95 on the planted-cluster corpus?

The r13 recall table (PERF.md) has PQ m=16 ks=256 at 0.887 mean
recall@20. The standard lever (Ge et al., "Optimized Product
Quantization", CVPR 2013; FAISS OPQ) is an orthogonal rotation R
applied before the split so variance/correlation spreads evenly across
subspaces. This ablation measures THREE rotations at m=16 over the
same 20k x 64-d clustered corpus and rescore_factor=8:

  identity        — the r13 baseline geometry
  random-orthogonal — QR of a seeded gaussian (decorrelates subspaces
                    by chance, the cheap FAISS OPQ_rand init)
  pca-balanced    — PCA basis with greedy eigenvalue allocation to
                    subspaces (balance sum-log-eigenvalue per bucket,
                    the FAISS OPQ "PCAR"-style init; one eigh of the
                    64x64 sample covariance — driver-side, bounded)

Rotation preserves dot products and norms, so the exact top-k sets are
unchanged; only the CODES (and therefore phase-1 ranking) move. The
measurement decides whether to productize a rotation field in the PQ
spec — per VERDICT, only if the win is real.

Usage: python scripts/measure_opq_rotation.py [n] [n_clusters] [dim]
           [n_queries] [k] [m]
Prints one row per rotation plus a FINAL JSON line for PERF.md.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.measure_ann_recall_clustered import make_clustered_corpus


def rotation_identity(sample: np.ndarray, m: int) -> np.ndarray:
    return np.eye(sample.shape[1])


def rotation_random(sample: np.ndarray, m: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    q, r = np.linalg.qr(rng.standard_normal((sample.shape[1],) * 2))
    # canonicalize signs so the rotation is unique/deterministic
    return q * np.sign(np.diag(r))


def rotation_pca_balanced(sample: np.ndarray, m: int) -> np.ndarray:
    """PCA basis, principal components allocated greedily to the m
    subspaces balancing the per-bucket sum of log-eigenvalues (the
    eigenvalue-allocation heuristic): each subspace then carries a
    comparable share of the corpus variance."""
    dim = sample.shape[1]
    dsub = dim // m
    cov = np.cov(sample.T)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for j in range(dim):  # descending eigenvalue
        free = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(free, key=lambda i: logs[i])
        buckets[b].append(j)
        logs[b] += math.log(max(float(w[j]), 1e-12))
    perm = [j for b in buckets for j in b]
    return v[:, perm]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    m = int(sys.argv[6]) if len(sys.argv) > 6 else 16

    from cassandra_analytics_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebook,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
    )
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="opq-rotation-ablation")
    spark.sparkContext.setLogLevel("ERROR")

    rows, _ = make_clustered_corpus(n, n_clusters, dim)
    mat = np.asarray([v for _, v, _ in rows], dtype=np.float64)
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    emb.count()

    queries = [(i, rows[i][1]) for i in range(n_queries)]
    exact: dict[int, set] = {}
    for qid, vec in queries:
        exact[qid] = {
            r.vec_id for r in brute_force_topk(emb, vec, k=k).collect()
        }

    results = {
        "n_corpus": n, "n_clusters": n_clusters, "dim": dim, "k": k,
        "n_queries": n_queries, "m": m, "ks": 256, "rescore_factor": 8,
        "rotations": {},
    }
    sample = mat[:20_000]
    for label, fit in (
        ("identity", rotation_identity),
        ("random-orthogonal", rotation_random),
        ("pca-balanced", rotation_pca_balanced),
    ):
        rot = fit(sample, m)
        assert np.allclose(rot @ rot.T, np.eye(dim), atol=1e-8)
        rmat = mat @ rot
        remb = spark.createDataFrame(
            [(i, [float(x) for x in rmat[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ).repartition(8).cache()
        remb.count()
        cb = train_pq_codebook(
            remb, m=m, ks=256, sample_size=20_000, iterations=15, seed=42
        )
        enc = pq_encode(remb, cb, keep_vec=True).cache()
        enc.count()
        recs = []
        for qid, vec in queries:
            qrot = [float(x) for x in np.asarray(vec) @ rot]
            got = {
                r.vec_id
                for r in pq_adc_topk(
                    enc, cb, qrot, k=k, vec_col="embedding",
                    rescore_factor=8,
                ).collect()
            }
            recs.append(len(got & exact[qid]) / k)
        mean = sum(recs) / len(recs)
        results["rotations"][label] = {
            "mean_recall": round(mean, 4),
            "min_recall": round(min(recs), 4),
        }
        print(f"{label:20s} m={m} mean recall@{k}={mean:.3f} "
              f"min={min(recs):.3f}", flush=True)
        enc.unpersist()
        remb.unpersist()
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
