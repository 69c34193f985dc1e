"""Round-16 optimization tests: catalog metadata memo + spread_scan.

The memo caches the RESOLVED DataFrame (file listing + footer schema),
never data — so identity of the returned object is the contract, plus
mtime invalidation so regenerated fixtures are never served stale.
spread_scan's contract: a round-robin repartition to defaultParallelism
appears exactly when the scan's split count is below half the cluster
parallelism (the single-row-group fixture case), and results are
row-identical to the raw table.
"""

from __future__ import annotations

import os
import shutil

from cassandra_analytics_spark.catalog import load_table, spread_scan


def test_load_table_memoized_same_object(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b


def test_load_table_mtime_invalidation(spark, sf_dir, tmp_path):
    src = os.path.join(sf_dir, "nation.parquet")
    dst = str(tmp_path / "nation.parquet")
    shutil.copyfile(src, dst)
    a = load_table(spark, str(tmp_path), "nation")
    # touch with a different mtime -> new resolution, not the stale entry
    os.utime(dst, (os.path.getmtime(dst) + 10, os.path.getmtime(dst) + 10))
    b = load_table(spark, str(tmp_path), "nation")
    assert a is not b
    assert a.count() == b.count()


def test_spread_scan_adds_parallelism_for_single_file(spark, sf_dir):
    raw = load_table(spark, sf_dir, "documents")
    spread = spread_scan(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    raw_parts = raw.rdd.getNumPartitions()
    if raw_parts * 2 <= par:
        # the fixture layout (single row-group file) cannot feed `par`
        # cores -> the spread plan must carry the repartition
        assert spread.rdd.getNumPartitions() == par
        assert "Repartition" in spread._jdf.queryExecution().analyzed().toString()
    else:
        assert spread is raw
    # row-identical either way (round-robin moves rows, never drops)
    assert spread.count() == raw.count()
    raw_ids = {r[0] for r in raw.select("doc_id").collect()}
    spread_ids = {r[0] for r in spread.select("doc_id").collect()}
    assert raw_ids == spread_ids


def test_spread_scan_memoized(spark, sf_dir):
    a = spread_scan(spark, sf_dir, "documents")
    b = spread_scan(spark, sf_dir, "documents")
    assert a is b
