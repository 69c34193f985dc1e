"""Spec-preserving ANN layout compaction (operators/ann_index.
compact_ann_index, round 15 — VERDICT r14 item 5): appends accrue one
file set per batch forever (the small-files problem on the hottest
read path); compaction rewrites the DATA files coalesced without
touching spec/codebook/centroids, and reads over the compacted layout
must resolve exactly as before."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_spark.fs import list_files
from cassandra_analytics_spark.operators.ann_index import (
    append_to_ann_index,
    append_to_ivf_index,
    build_ann_index,
    build_ivf_index,
    compact_ann_index,
    query_ann_index,
    query_ivf_index,
)
from cassandra_analytics_spark.operators.pq import (
    append_to_ivf_pq_index,
    append_to_pq_index,
    query_ivf_pq_index,
    query_pq_index,
    save_ivf_pq_index,
    save_pq_index,
)


def _corpus(spark, n=300, dim=16, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _halves(df):
    return (
        df.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0),
        df.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1),
    )


def _topk_rows(df):
    return [(r["vec_id"], round(r["cosine_sim"], 12)) for r in df.collect()]


def test_compact_ivf_pq_layout_roundtrip(spark, tmp_path):
    """The richest layout (cell-partitioned + codes + residuals + two
    sidecars): build on half, append the other half (extra file sets),
    compact — file count drops to one per cell, sidecar bytes are
    untouched, and a probe-all query returns the identical top-k."""
    rows, df = _corpus(spark)
    first, second = _halves(df)
    q = rows[0][1]
    path = str(tmp_path / "ivfpq")
    save_ivf_pq_index(
        first, path, num_centroids=4, m=4, ks=16,
        sample_size=200, iterations=5, seed=42, residuals=True,
    )
    append_to_ivf_pq_index(second, path)
    append_to_ivf_pq_index(second.limit(0), path)  # empty batch: legal
    before_rows = _topk_rows(
        query_ivf_pq_index(spark, path, q, k=10, num_probes=4)
    )
    spec_files = sorted(list_files(spark, f"{path}_spec"))
    cb_files = sorted(list_files(spark, f"{path}_codebook"))
    cent_files = sorted(list_files(spark, f"{path}_centroids"))

    stats = compact_ann_index(spark, path)
    assert stats["format"] == "ivf-pq-v1"
    assert stats["files_after"] < stats["files_before"]
    # exactly one data file per cell directory
    n_cells = spark.read.parquet(path).select("cell").distinct().count()
    assert stats["files_after"] == n_cells
    # sidecars untouched (same file listing — never rewritten)
    assert sorted(list_files(spark, f"{path}_spec")) == spec_files
    assert sorted(list_files(spark, f"{path}_codebook")) == cb_files
    assert sorted(list_files(spark, f"{path}_centroids")) == cent_files
    # the probe resolves identically over the compacted layout
    after_rows = _topk_rows(
        query_ivf_pq_index(spark, path, q, k=10, num_probes=4)
    )
    assert after_rows == before_rows
    # appends still work against the untouched spec/codebook
    append_to_ivf_pq_index(second.limit(3), path)


def test_compact_flat_pq_layout_roundtrip(spark, tmp_path):
    rows, df = _corpus(spark, n=200)
    first, second = _halves(df)
    q = rows[0][1]
    path = str(tmp_path / "pq")
    save_pq_index(
        first, path, m=4, ks=16, sample_size=200, iterations=5, seed=42
    )
    append_to_pq_index(second, path)
    before_rows = _topk_rows(query_pq_index(spark, path, q, k=10))
    stats = compact_ann_index(spark, path, files_per_partition=2)
    assert stats["format"] == "pq-v1"
    # unpartitioned layout: files_per_partition IS the file count
    assert stats["files_after"] == 2
    assert _topk_rows(query_pq_index(spark, path, q, k=10)) == before_rows


def test_compact_ivf_and_lsh_layouts_roundtrip(spark, tmp_path):
    rows, df = _corpus(spark, n=200)
    first, second = _halves(df)
    q = rows[0][1]

    ivf = str(tmp_path / "ivf")
    build_ivf_index(first, ivf, num_centroids=4, quantize=True)
    append_to_ivf_index(second, ivf)
    before = _topk_rows(query_ivf_index(spark, ivf, q, k=10, num_probes=4))
    stats = compact_ann_index(spark, ivf)
    assert stats["format"] == "ivf-v1"
    assert stats["files_after"] < stats["files_before"]
    assert (
        _topk_rows(query_ivf_index(spark, ivf, q, k=10, num_probes=4))
        == before
    )

    lsh = str(tmp_path / "lsh")
    build_ann_index(first, lsh, num_planes=4)
    append_to_ann_index(second, lsh)
    before = _topk_rows(query_ann_index(spark, lsh, q, k=10))
    stats = compact_ann_index(spark, lsh)
    assert stats["format"] == "ann-lsh-v1"
    assert stats["files_after"] < stats["files_before"]
    assert _topk_rows(query_ann_index(spark, lsh, q, k=10)) == before


def test_compact_refusals_and_spec_stash_discipline(spark, tmp_path):
    """No spec -> loud refusal (including the mid-compaction stash
    state, which a concurrent read must also refuse); unknown format ->
    loud; files_per_partition < 1 -> loud."""
    _, df = _corpus(spark, n=50)
    bare = str(tmp_path / "bare")
    df.write.parquet(bare)
    with pytest.raises(ValueError, match="no persisted spec"):
        compact_ann_index(spark, bare)
    with pytest.raises(ValueError, match="files_per_partition"):
        compact_ann_index(spark, bare, files_per_partition=0)

    # unknown spec format refused before anything is touched
    weird = str(tmp_path / "weird")
    df.write.parquet(weird)
    spark.createDataFrame(
        [("future-v9",)], "format string"
    ).write.parquet(f"{weird}_spec")
    with pytest.raises(ValueError, match="unknown layout format"):
        compact_ann_index(spark, weird)

    # mid-compaction state: spec stashed aside -> reads refuse loudly
    from cassandra_analytics_spark.fs import rename_path

    path = str(tmp_path / "pq2")
    save_pq_index(df, path, m=4, ks=16, sample_size=100, seed=42)
    assert rename_path(spark, f"{path}_spec", f"{path}_spec__compacting")
    with pytest.raises(ValueError, match="no persisted PQ spec"):
        query_pq_index(spark, path, [0.0] * 16, k=3)
    # operator recovery: restore the stash, reads work again
    assert rename_path(spark, f"{path}_spec__compacting", f"{path}_spec")
    assert query_pq_index(spark, path, [1.0] * 16, k=3).count() == 3
