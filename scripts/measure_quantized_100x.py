"""Round-11 100x soak (VERDICT r10 item 6): quantized top-k, the
quantized IVF probe/kNN join, and Bloom decontamination at the .scale100
derived corpus (200k x 64-d embeddings, 500k documents).

Measures, per operator: exactness against the float/exact twin, wall
time, and — for the quantized layout — the on-disk byte split between
the float column and the code columns (the scan-byte cut a phase-1
probe actually enjoys, read from the parquet footers).

Usage: python scripts/measure_quantized_100x.py [scale_dir]
Results go to stdout; PERF.md records them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.session import get_session


def _timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"  {label}: {dt:.2f}s")
    return out, dt


def _column_bytes(layout_dir: str) -> dict[str, int]:
    """Compressed on-disk bytes per column across a parquet directory
    tree — the honest denominator for the 'phase 1 reads ~1 byte/dim'
    claim."""
    import pyarrow.parquet as pq

    sizes: dict[str, int] = {}
    for root, _dirs, files in os.walk(layout_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    sizes[name] = sizes.get(name, 0) + col.total_compressed_size
    return sizes


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale100"
    )
    spark = get_session(app_name="measure_quantized_100x")

    from cassandra_analytics_spark.operators.ann_index import (
        build_ivf_index,
        ivf_knn_join,
        query_ivf_index,
        query_ivf_index_quantized,
    )
    from cassandra_analytics_spark.operators.dedup import (
        contamination_overlap,
        contamination_overlap_bloom,
    )
    from cassandra_analytics_spark.operators.quantize import (
        quantize_embeddings,
        quantized_topk,
    )
    from cassandra_analytics_spark.operators.similarity import brute_force_topk

    e = load_table(spark, scale_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    qvec = [float(x) for x in e.orderBy("vec_id").first()["embedding"]]
    corpus = e.filter(F.col("vec_id") != 0)
    print(f"corpus: {n} vectors x {len(qvec)} dims from {scale_dir}")

    # --- 1. quantized_topk vs brute force -------------------------------
    print("[1] quantized_topk (k=10, factor=8) vs brute force")
    q = quantize_embeddings(corpus, keep_vec=True).localCheckpoint(eager=True)
    want, t_bf = _timed(
        "brute_force_topk",
        lambda: [
            (r.vec_id, round(r.cosine_sim, 9))
            for r in brute_force_topk(corpus, qvec, k=10).collect()
        ],
    )
    for mode in ("pushdown", "join"):
        got, t_q = _timed(
            f"quantized_topk[{mode}]",
            lambda m=mode: [
                (r.vec_id, round(r.cosine_sim, 9))
                for r in quantized_topk(
                    q, qvec, k=10, vec_col="embedding",
                    rescore_factor=8, rescore_mode=m,
                ).collect()
            ],
        )
        print(f"  exact[{mode}]: {got == want}")

    # --- 2. quantized IVF layout ----------------------------------------
    print("[2] quantized IVF layout (64 cells)")
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="q100x_") + "/ivf"
    try:
        _, t_build = _timed(
            "build_ivf_index(quantize=True)",
            lambda: build_ivf_index(
                corpus, path, num_centroids=64, quantize=True
            ),
        )
        sizes = _column_bytes(path)
        fb = sizes.get("embedding", 0)
        qb = sum(sizes.get(c, 0) for c in ("qvec", "qmin", "qscale"))
        print(
            f"  on-disk bytes: float={fb:,} codes+meta={qb:,} "
            f"(phase-1 scan reads {qb / fb:.2%} of the float bytes)"
        )
        want_pa, _ = _timed(
            "float probe-all (exact)",
            lambda: [
                (r.vec_id, round(r.cosine_sim, 9))
                for r in query_ivf_index(
                    spark, path, qvec, k=10, num_probes=64
                ).collect()
            ],
        )
        got_pa, _ = _timed(
            "quantized probe-all + rescore",
            lambda: [
                (r.vec_id, round(r.cosine_sim, 9))
                for r in query_ivf_index_quantized(
                    spark, path, qvec, k=10, num_probes=64, rescore_factor=8
                ).collect()
            ],
        )
        print(f"  probe-all exact: {got_pa == want_pa == want}")
        got_p4_f, t_p4f = _timed(
            "float probe-4",
            lambda: [
                (r.vec_id, round(r.cosine_sim, 9))
                for r in query_ivf_index(
                    spark, path, qvec, k=10, num_probes=4
                ).collect()
            ],
        )
        got_p4_q, t_p4q = _timed(
            "quantized probe-4 + rescore",
            lambda: [
                (r.vec_id, round(r.cosine_sim, 9))
                for r in query_ivf_index_quantized(
                    spark, path, qvec, k=10, num_probes=4, rescore_factor=8
                ).collect()
            ],
        )
        print(f"  probe-4 paths agree: {got_p4_q == got_p4_f}")

        # --- 3. quantized kNN join --------------------------------------
        print("[3] ivf_knn_join use_codes (8 queries, probe-8, k=5)")
        queries_df = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        key = lambda r: (r.qid, r.vec_id, round(r.cosine_sim, 9))  # noqa: E731
        plain, t_jf = _timed(
            "float join",
            lambda: sorted(
                map(
                    key,
                    ivf_knn_join(
                        queries_df, path, k=5, num_probes=8
                    ).collect(),
                )
            ),
        )
        coded, t_jq = _timed(
            "coded join + rescore",
            lambda: sorted(
                map(
                    key,
                    ivf_knn_join(
                        queries_df, path, k=5, num_probes=8,
                        use_codes=True, rescore_factor=8,
                    ).collect(),
                )
            ),
        )
        print(f"  join paths agree: {coded == plain}")
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    # --- 4. Bloom decontamination at 500k docs --------------------------
    # Two fixture shapes. HIGH-HIT: benchmark docs' key-shifted
    # near-copies stay IN the corpus, so ~every doc shares shingles with
    # the benchmark — the prefilter cannot prune (the operator's
    # documented lose case). LOW-HIT: the benchmark is copy-0 docs and
    # every key-shifted copy of them is EXCLUDED from the corpus — the
    # realistic decontamination posture where most shingles miss.
    d = load_table(spark, scale_dir, "documents").select("doc_id", "text")
    base_mod = F.pmod(F.col("doc_id"), F.lit(5000))  # make_scale key offset
    shapes = {
        "high-hit": (
            d.filter(F.col("doc_id") % 997 == 0),
            d.filter(F.col("doc_id") % 997 != 0),
        ),
        "low-hit": (
            d.filter((base_mod % 997 == 0) & (F.col("doc_id") < 5000)),
            d.filter(base_mod % 997 != 0),
        ),
    }
    for shape, (bench, dcorpus) in shapes.items():
        print(f"[4] contamination_overlap_bloom at 500k docs ({shape})")
        print(f"  benchmark docs: {bench.count()}")
        want_c, t_exact = _timed(
            "exact broadcast path",
            lambda b=bench, c=dcorpus: sorted(
                (r.doc_id, r.n_overlap)
                for r in contamination_overlap(
                    c, b, shingle_n=3, min_overlap=3
                ).collect()
            ),
        )
        got_c, t_bloom = _timed(
            "bloom path (num_bits=2^23)",
            lambda b=bench, c=dcorpus: sorted(
                (r.doc_id, r.n_overlap)
                for r in contamination_overlap_bloom(
                    c, b, shingle_n=3, min_overlap=3
                ).collect()
            ),
        )
        print(f"  flagged: {len(want_c)}  bit-identical: {got_c == want_c}")
    spark.stop()


if __name__ == "__main__":
    main()
