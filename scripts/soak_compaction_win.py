"""Measure the compaction WIN (round 16, VERDICT r15 item 3): the
round-15 compaction family is proven correct (oracle-exact reads,
sidecar byte-identity), but its benefit at a realistic append count was
arithmetic, not evidence. This soak makes it a measurement:

1. IVF-PQ layout: build once, append ~100 daily-sized batches
   (append_to_ivf_pq_index — one file set per cell per batch), measure
   probe wall (query_ivf_pq_index, averaged over queries) and data-file
   count BEFORE vs AFTER compact_ann_index. Probe results must be
   row-identical through the compaction.
2. Doc store: ~100 batch-* dirs, measure the latest-wins merge read
   (_latest_store_texts + count) before vs after compact_doc_store.
3. Pairs store: ~100 batch-* dirs, measure the consumers' glob-read
   (collected_pairs + dropDuplicates + count) before vs after
   compact_pairs_store. Row multisets must be identical.

Usage: python scripts/soak_compaction_win.py [n_appends] [batch_rows]
Prints one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps=3):
    """Best-of-reps wall time (seconds) + last result."""
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> int:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.fs import list_files
    from cassandra_analytics_spark.operators.ann_index import (
        compact_ann_index,
    )
    from cassandra_analytics_spark.operators.pq import (
        append_to_ivf_pq_index,
        query_ivf_pq_index,
        save_ivf_pq_index,
    )
    from cassandra_analytics_spark.session import get_session
    from cassandra_analytics_spark.streaming.dedup_stream import (
        _latest_store_texts,
        compact_doc_store,
        compact_pairs_store,
        collected_pairs,
    )

    spark = get_session(app_name="soak-compaction-win")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak-compaction-")
    rng = random.Random(7)
    dim, n_base, n_cells = 64, 20_000, 16
    results: dict = {
        "n_appends": n_appends,
        "batch_rows": batch_rows,
        "dim": dim,
        "n_base": n_base,
    }

    try:
        # ---- 1. IVF-PQ layout: base + n_appends daily batches ----
        def vec():
            return [rng.gauss(0, 1) for _ in range(dim)]

        base = spark.createDataFrame(
            [(i, vec()) for i in range(n_base)],
            "vec_id long, embedding array<double>",
        )
        path = os.path.join(root, "ivfpq")
        save_ivf_pq_index(
            base, path, num_centroids=n_cells, m=8, ks=32,
            sample_size=5_000, iterations=8, seed=42, residuals=True,
        )
        t0 = time.time()
        next_id = n_base
        for _ in range(n_appends):
            batch = spark.createDataFrame(
                [(next_id + j, vec()) for j in range(batch_rows)],
                "vec_id long, embedding array<double>",
            )
            append_to_ivf_pq_index(batch, path)
            next_id += batch_rows
        results["append_wall_sec"] = round(time.time() - t0, 1)

        queries = [vec() for _ in range(10)]

        def probe_all():
            return [
                tuple(
                    (r.vec_id, round(r.cosine_sim, 9))
                    for r in query_ivf_pq_index(
                        spark, path, q, k=10, num_probes=2,
                        rescore_factor=8,
                    ).collect()
                )
                for q in queries
            ]

        files_b = len(list_files(spark, path, suffix=".parquet"))
        wall_b, res_b = _timed(probe_all)
        stats = compact_ann_index(spark, path)
        files_a = len(list_files(spark, path, suffix=".parquet"))
        wall_a, res_a = _timed(probe_all)
        assert res_a == res_b, "probe results changed through compaction"
        results["ivfpq"] = {
            "files_before": files_b,
            "files_after": files_a,
            "probe_wall_before_sec": round(wall_b, 2),
            "probe_wall_after_sec": round(wall_a, 2),
            "compact_stats": stats,
        }
        print("ivfpq:", results["ivfpq"], flush=True)

        # ---- 2. doc store with n_appends batch dirs ----
        docs = os.path.join(root, "docs")
        words = ["alpha", "beta", "gamma", "delta", "echo", "fox"]
        for b in range(n_appends):
            rows = [
                Row(
                    doc_id=b * batch_rows + j,
                    text=" ".join(rng.choices(words, k=30)),
                    __batch_id=b,
                )
                for j in range(batch_rows)
            ]
            spark.createDataFrame(rows).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(docs, f"batch-{b:010d}"))

        def read_docs():
            return _latest_store_texts(spark, docs, "doc_id", "text").count()

        files_b = len(list_files(spark, docs, suffix=".parquet"))
        wall_b, cnt_b = _timed(read_docs)
        dstats = compact_doc_store(spark, docs)
        files_a = len(list_files(spark, docs, suffix=".parquet"))
        wall_a, cnt_a = _timed(read_docs)
        assert cnt_a == cnt_b
        results["doc_store"] = {
            "files_before": files_b,
            "files_after": files_a,
            "read_wall_before_sec": round(wall_b, 2),
            "read_wall_after_sec": round(wall_a, 2),
            "rows": cnt_a,
        }
        print("doc_store:", results["doc_store"], flush=True)

        # ---- 3. pairs store with n_appends batch dirs ----
        pairs = os.path.join(root, "pairs")
        for b in range(n_appends):
            rows = [
                Row(
                    a=b * 10 + j,
                    b=b * 10 + j + 1,
                    jaccard=0.9 + 0.001 * j,
                    batch_id=b,
                )
                for j in range(10)
            ]
            spark.createDataFrame(rows).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(pairs, f"batch-{b:010d}"))

        def read_pairs():
            return sorted(
                (r.a, r.b, round(r.jaccard, 9), r.batch_id)
                for r in collected_pairs(spark, pairs).collect()
            )

        files_b = len(list_files(spark, pairs, suffix=".parquet"))
        wall_b, rows_b = _timed(read_pairs)
        pstats = compact_pairs_store(spark, pairs)
        files_a = len(list_files(spark, pairs, suffix=".parquet"))
        wall_a, rows_a = _timed(read_pairs)
        assert rows_a == rows_b, "pairs changed through compaction"
        results["pairs_store"] = {
            "files_before": files_b,
            "files_after": files_a,
            "read_wall_before_sec": round(wall_b, 2),
            "read_wall_after_sec": round(wall_a, 2),
            "rows": len(rows_a),
            "compact_stats": pstats,
        }
        print("pairs_store:", results["pairs_store"], flush=True)
        print(json.dumps(results))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
