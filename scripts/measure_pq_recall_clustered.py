"""PQ/ADC recall on the PLANTED-CLUSTER corpus vs SQ8 at matched bytes
(round 13, VERDICT r12 item 6 gate): the same 20k x 64-d clustered
corpus the r9/r11 sweeps used, flat (no IVF — isolates the quantizer),
recall@k of the two-phase top-k per scheme and per PQ geometry.

Byte accounting per vector (candidate-ranking phase):
  float64 column   : 512 B
  SQ8 (quantize.py): 64 B codes + 16 B (min, scale)
  PQ m, ks<=256    : m B codes + 8 B stored norm
so PQ m=64 matches SQ8's code bytes exactly ("equal bytes"), m=16 is
4x past it, m=8 is 8x past it. TRAINED codebooks (per-subspace
k-means) vs a SAMPLED (iterations=0-like) ablation shows why training
is gated — r9 measured sampled codebooks weak for IVF routing and PQ
is more codebook-sensitive.

Usage: python scripts/measure_pq_recall_clustered.py \
           [n_vectors] [n_clusters] [dim] [n_queries] [k]
Prints one row per scheme plus a FINAL JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.measure_ann_recall_clustered import make_clustered_corpus


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 20

    from cassandra_analytics_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebook,
    )
    from cassandra_analytics_spark.operators.quantize import (
        quantize_embeddings,
        quantized_topk,
    )
    from cassandra_analytics_spark.operators.similarity import (
        brute_force_topk,
    )
    from cassandra_analytics_spark.session import get_session

    spark = get_session(app_name="pq-recall-clustered")
    spark.sparkContext.setLogLevel("ERROR")

    rows, _ = make_clustered_corpus(n, n_clusters, dim)
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
        "n_queries": n_queries, "rescore_factor": 8, "schemes": {},
    }

    def recall_of(topk_fn, label, code_bytes):
        recs = []
        for qid, vec in queries:
            got = {r.vec_id for r in topk_fn(vec).collect()}
            recs.append(len(got & exact[qid]) / k)
        mean = sum(recs) / len(recs)
        results["schemes"][label] = {
            "code_bytes_per_vec": code_bytes,
            "mean_recall": round(mean, 4),
            "min_recall": round(min(recs), 4),
        }
        print(f"{label:28s} bytes/vec={code_bytes:3d} "
              f"mean recall@{k}={mean:.3f} min={min(recs):.3f}",
              flush=True)

    sq8 = quantize_embeddings(emb, keep_vec=True).cache()
    sq8.count()
    recall_of(
        lambda v: quantized_topk(sq8, v, k=k, vec_col="embedding",
                                 rescore_factor=8),
        "SQ8", dim + 16,
    )
    for m in (8, 16, 32, 64):
        cb = train_pq_codebook(
            emb, m=m, ks=256, sample_size=20_000, iterations=15, seed=42
        )
        enc = pq_encode(emb, cb, keep_vec=True).cache()
        enc.count()
        recall_of(
            lambda v, cb=cb, enc=enc: pq_adc_topk(
                enc, cb, v, k=k, vec_col="embedding", rescore_factor=8
            ),
            f"PQ m={m} ks=256 (trained)", m + 8,
        )
        enc.unpersist()
    # ablation: untrained (1-iteration ~ sampled) codebook at m=16
    cb0 = train_pq_codebook(
        emb, m=16, ks=256, sample_size=20_000, iterations=1, seed=42
    )
    enc0 = pq_encode(emb, cb0, keep_vec=True).cache()
    enc0.count()
    recall_of(
        lambda v: pq_adc_topk(enc0, cb0, v, k=k, vec_col="embedding",
                              rescore_factor=8),
        "PQ m=16 ks=256 (1-iter)", 16 + 8,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
