"""Query registry: every operator from SURVEY §2 that the engine claims is
registered here as (name, spark_fn, oracle_sql).

The driver runs each spark_fn at sf0.01 against the DuckDB oracle SQL
(row-count + schema + order-insensitive value-hash). Tests run the same
comparison at sf0.001. Entries with ``oracle=None`` are genuinely
non-SQL-expressible (hash-seeded LSH, approx sketches) and get a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle`` is equivalent ANSI SQL for DuckDB over
    the pre-registered fixture views."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The round driver verifies the FIRST ~50 registry entries per round
# (CORRECTNESS_r01.json is exactly the first 50 in registration order).
# To get every query a driver row across rounds, each round front-loads
# the names that most need one. After r1..r4 the union covers every
# registered query with usable evidence, so round-5 priority is pure
# evidence-freshness rotation (VERDICT r4 item 1): (1) queries NEW this
# round, (2) queries whose implementation was touched this round (the
# ADVICE r4 fixes: replay-safe LSH occupancy, streaming tz check,
# restore member-name validation, rollback-failure reporting; the dedup
# steady-state work; and the 100x-audit plan fixes: single-pass
# tfidf/bm25 core, persisted shingle index, partial-reuse rollup,
# checkpointed incremental-LSH probe), (3) the names whose newest
# driver row is from r1/r2 — scalar_date_funcs first (r1-only).
_ROUND_PRIORITY: list[str] = [
    # --- (1) new this round ---
    "pack_greedy_bins",        # last pytest-only operator, now driver-gated
    "stratified_hash_sample_langs",  # deterministic sampler, oracle-exact
    "dedup_boilerplate_segments",    # C4-style segment dedup, oracle-exact
    # --- (2) implementation touched this round ---
    "dedup_incremental_pipeline",   # dedup_index occupancy + id-count fix
    "dedup_incremental_lsh",
    "streaming_incremental_dedup",
    "coordinated_write_roundtrip",  # rollback-failure reporting
    "bundle_write_restore",         # member-name validation
    "streaming_hourly_stats",       # events_stream tz check
    "streaming_sessionize",
    "streaming_dedup_union",
    "streaming_interval_join",
    "dedup_minhash_lsh",            # steady-state perf work
    "dedup_simhash",
    "text_tfidf_search",            # scorer core: single-pass refactor
    "text_bm25_search",
    "dedup_ngram_jaccard",          # shingle index persisted
    "rollup_time_hierarchy",        # partial-reuse rollup (1 scan)
    # --- (3) stale: newest driver evidence r1/r2 ---
    "scalar_date_funcs",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "agg_median_percentiles",
    "stat_moments_lineitem",
    "window_percent_rank",
    "window_ranking_functions",
    "window_range_frame_revenue",
    "pivot_returnflag_status",
    "unpivot_segment_metrics",
    "events_json_extract",
    "events_json_struct",
    "events_hourly_stats",
    "array_agg_sorted",
    "array_function_suite",
    "map_entry_extraction",
    "bool_aggs",
    "null_handling_funcs",
    "conditional_agg_filter",
    "acctbal_width_buckets",
    "explode_embeddings",
    "scalar_math_funcs",
]


def _ordered_names() -> list[str]:
    front = [n for n in _ROUND_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    return front + rest


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for side effect: each module registers its queries.
    from cassandra_analytics_spark.queries import (  # noqa: F401
        cassandra_semantics,
        llm,
        relational,
        relational_ext,
        temporal,
        tpch_derived,
        tpch_suite,
        windows_sketches,
    )

    _LOADED = True
