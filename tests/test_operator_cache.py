"""Bounded operator-cache LRU (ADVICE r5: unpersist-never persist() calls)."""

from __future__ import annotations

from cassandra_analytics_spark.operators import _cache
from cassandra_analytics_spark.operators._cache import (
    clear_operator_caches,
    register_cached,
)


def test_lru_evicts_oldest_and_clear_releases_all(spark):
    clear_operator_caches()
    dfs = []
    for i in range(_cache.MAX_LIVE_CACHED + 3):
        df = spark.range(10 + i).persist()
        df.count()  # materialize the cache entry
        register_cached(df)
        dfs.append(df)
    # oldest 3 evicted (unpersisted), newest MAX_LIVE still cached
    assert all(df.storageLevel.useMemory is False for df in dfs[:3])
    assert dfs[-1].storageLevel.useMemory or dfs[-1].storageLevel.useDisk
    # eviction is correctness-neutral: evicted frames still compute
    assert dfs[0].count() == 10
    clear_operator_caches()
    assert all(not (df.storageLevel.useMemory or df.storageLevel.useDisk) for df in dfs)


def test_cached_plan_single_scan_survives_caller_wrapping(spark, sf_dir):
    """The regression that killed the finalizer design: a caller that
    derives further transformations (orderBy/limit) and drops the
    operator's result object must still execute the single-scan cached
    plan. tfidf's per-doc core is the canonical case."""
    from cassandra_analytics_spark.catalog import load_table
    from cassandra_analytics_spark.operators.text import tfidf_scores

    import gc

    d = load_table(spark, sf_dir, "documents")
    wrapped = tfidf_scores(d, ["spark", "merge"]).orderBy("doc_id").limit(5)
    gc.collect()  # would have fired the old finalizer before execution
    plan = wrapped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 1
    assert len(wrapped.collect()) == 5
    clear_operator_caches()
