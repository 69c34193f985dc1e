#!/usr/bin/env python3
"""Measure the spread_scan cost/benefit floor (r17, VERDICT item 1).

Builds single-row-group documents corpora at several scales (mutated
text, unique doc_ids so pair joins keep realistic selectivity), then
times three representative heavy shapes (tfidf per-doc core, the cheap
token aggregate, the simhash sketch+pair operator) at several spread
widths, INTERLEAVED round-robin so sandbox weather hits rounds, not
arms. Output: per (shape, rows, width) min seconds — the crossover
tells us the rows-per-task floor where a round-robin exchange starts
paying for itself.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cassandra_analytics_spark.session import get_session

EXP_DIR = "/tmp/spread_exp"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("SPREAD_SCALES", "1,4,16").split(",")]
WIDTHS = [int(w) for w in os.environ.get("SPREAD_WIDTHS", "0,4,8,32").split(",")]
RUNS = int(os.environ.get("SPREAD_RUNS", "3"))


def build_corpora() -> dict[int, str]:
    os.makedirs(EXP_DIR, exist_ok=True)
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    n = base.num_rows
    out = {}
    for scale in SCALES:
        path = os.path.join(EXP_DIR, f"docs_x{scale}.parquet")
        out[scale] = path
        if os.path.exists(path):
            continue
        chunks = []
        for k in range(scale):
            ids = pa.array(
                [v + k * n for v in base.column("doc_id").to_pylist()],
                type=base.schema.field("doc_id").type,
            )
            # mutate text per replica so near-dup joins keep realistic
            # selectivity (exact copies would explode the pair joins)
            texts = pa.array(
                [f"{t} copyTag{k} r{(i * 7 + k) % 97}" if t is not None else None
                 for i, t in enumerate(base.column("text").to_pylist())]
            )
            chunks.append(
                base.set_column(base.schema.get_field_index("doc_id"), "doc_id", ids)
                    .set_column(base.schema.get_field_index("text"), "text", texts)
            )
        big = pa.concat_tables(chunks)
        # ONE row group: mimic the unsplittable fixture layout
        pq.write_table(big, path, row_group_size=big.num_rows)
    return out


def main() -> None:
    corp = build_corpora()
    spark = get_session(app_name="spread_ab", master="local[32]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from cassandra_analytics_spark.operators.dedup import simhash_near_dup_pairs
    from cassandra_analytics_spark.operators.text import tfidf_scores
    from cassandra_analytics_spark.operators._cache import clear_operator_caches

    def tfidf_shape(d, raw):
        return (tfidf_scores(d, ["spark", "merge", "vector"], stats_df=raw)
                .orderBy(F.desc("score"), "doc_id").limit(50))

    def tokstats_shape(d, raw):
        from cassandra_analytics_spark.operators.text import token_count
        return (d.withColumn("__tokens", token_count(F.col("text")))
                 .groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("__tokens").alias("total_tokens")))

    def simhash_shape(d, raw):
        return simhash_near_dup_pairs(d, max_hamming=6, num_blocks=8,
                                      blocks_per_key=2)

    def langid_shape(d, raw):
        from cassandra_analytics_spark.operators.text import language_id
        return (d.withColumn("lang_guess", language_id(F.col("text")))
                 .groupBy("lang", "lang_guess")
                 .agg(F.count(F.lit(1)).alias("n_docs")))

    def pii_shape(d, raw):
        scrubbed = F.regexp_replace(
            F.regexp_replace(F.col("text"),
                             "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"),
            "[0-9]{6,}", "<NUM>")
        return d.select(
            "doc_id", F.md5(scrubbed).alias("scrubbed_md5"),
            (F.length("text") - F.length(
                F.regexp_replace(F.col("text"), "[0-9]{6,}", "")))
            .cast("long").alias("digits_removed")).orderBy("doc_id")

    def repetition_shape(d, raw):
        from cassandra_analytics_spark.operators.text import repetition_stats
        return repetition_stats(d)

    shapes = {"tfidf": tfidf_shape, "tokstats": tokstats_shape,
              "simhash": simhash_shape, "langid": langid_shape,
              "pii": pii_shape, "repetition": repetition_shape}
    only = os.environ.get("SPREAD_SHAPES")
    if only:
        shapes = {k: v for k, v in shapes.items() if k in only.split(",")}

    arms = []  # (shape, scale, width)
    for scale in SCALES:
        for w in WIDTHS:
            for s in shapes:
                arms.append((s, scale, w))

    results: dict[tuple, list[float]] = {a: [] for a in arms}
    for rnd in range(RUNS):
        for (sname, scale, w) in arms:
            clear_operator_caches()
            spark.catalog.clearCache()
            raw = spark.read.parquet(corp[scale])
            d = raw.repartition(w) if w > 0 else raw
            spark.sparkContext.setJobDescription(
                f"{sname} x{scale} w{w} r{rnd}")
            t0 = time.time()
            shapes[sname](d, raw).write.mode("overwrite").format("noop").save()
            results[(sname, scale, w)].append(time.time() - t0)
        print(f"-- round {rnd} done", flush=True)

    print(f"{'shape':>10} {'rows':>8} {'width':>5}  min_s  all")
    base_n = pq.ParquetFile(corp[1]).metadata.num_rows if 1 in corp else 5000
    for (sname, scale, w), ts in sorted(results.items()):
        rows = scale * base_n
        print(f"{sname:>10} {rows:>8} {w:>5}  {min(ts):6.3f}  "
              + " ".join(f"{t:.2f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
