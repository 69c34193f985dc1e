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
# (each CORRECTNESS_r{N}.json is exactly the first 50 in registration
# order). To get every query a driver row across rounds, each round
# front-loads the names that most need one. Round-11 priority (VERDICT
# r10 items 1-5): (0) the six NEW queries — quantized IVF probe,
# quantized kNN join, join-mode rescore, quantized streaming ingest,
# multi-DC EACH_QUORUM, code-shuffled SemDeDup pair stage — never
# driver-proved; (1) queries whose
# IMPLEMENTATION this round touched: the quantize module was refactored
# (shared scoring helpers, pruning-safe guards), ivf_knn_join's routing
# table gained a column, build/append_to_ivf_index gained the spec
# field, the Bloom path was re-plumbed through a shared body, the
# semantic stream bootstrap gained the quantize flag, and replicas.py
# was restructured for per-DC math; (2) the r7 cohort (oldest evidence,
# VERDICT item 5); (3) 29 of the 44 r8-cohort names — the complex-
# operator subset (all TPC-H, dedup, streaming, window, packing rows).
# The 15 deferred r8 names (simple scalar/array/json function suites:
# acctbal_width_buckets, array_agg_sorted, array_function_suite,
# bool_aggs, conditional_agg_filter, events_json_extract,
# events_json_struct, explode_embeddings, map_entry_extraction,
# null_handling_funcs, scalar_date_funcs, scalar_math_funcs,
# unpivot_segment_metrics, pivot_returnflag_status — each a pure
# expression suite with an in-window relative and an untouched
# implementation — plus window_ranking_functions, displaced when the
# late dedup_semantic_on_index_quantized query joined the window) go
# FIRST in round 12. After r11 no registered query's
# newest driver row is older than r8.
_ROUND_PRIORITY: list[str] = [
    # --- (0) NEW this round: never driver-proved ---
    "ann_ivf_quantized_topk",            # IVF-SQ8 probe, oracle-exact
    "ann_ivf_quantized_knn_join",        # byte-reduced kNN join
    "quantized_topk_join_rescored",      # distributed (no-collect) rescore
    "streaming_semantic_dedup_quantized",  # quantized layout under stream
    "replica_read_each_quorum",          # per-DC NTS consistency math
    "dedup_semantic_on_index_quantized",  # code-shuffled pair stage
    # --- (1) implementation touched this round ---
    "embedding_quantize_stats",      # quantization_exprs refactor + guards
    "quantized_topk_rescored",       # helper extraction + rescore_mode
    "ann_ivf_knn_join_exact",        # routing table gained __qsum
    "ann_ivf_knn_join_string_ids",   # same path, string ids
    "decontaminate_bloom",           # membership rewritten as JVM joins
    "streaming_semantic_dedup",      # bootstrap gained quantize flag
    "dedup_semantic_on_index",       # build_ivf_index spec field
    "dedup_semantic_append_index",   # append/assign spec field
    "replica_read_all",              # replicas.py per-DC restructure
    "ann_lsh_append_topk",           # sibling of the touched index module
    # --- (2) stale: newest driver evidence r7 ---
    "token_range_histogram",
    "agg_hll_sketch_union",
    "window_moving_avg",
    "window_running_revenue",
    "window_topk_orders_per_customer",
    # --- (3) stale: newest driver evidence r8 (complex-operator subset) ---
    "agg_median_percentiles",
    "bulk_write_roundtrip",
    "cosine_topk_embeddings",
    "dedup_incremental_lsh",
    "dedup_incremental_lsh_confirmed",
    "dedup_incremental_pipeline",
    "dedup_intradoc_segments",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_hourly_stats",
    "pack_greedy_bins",
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
    "stat_moments_lineitem",
    "stratified_hash_sample_langs",
    "streaming_interval_join",
    "streaming_sessionize",
    "window_percent_rank",
    "window_range_frame_revenue",
    # window_ranking_functions rolled past the 50-row window when
    # dedup_semantic_on_index_quantized landed — it joins the deferred
    # r8 cohort leading round 12
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
