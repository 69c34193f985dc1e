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
# front-loads the names that most need one. Round-13 priority (VERDICT
# r12 items 1-4; r12 was an idle round so this executes the carried-over
# r11 list): (0) queries NEW this round — PQ/ADC top-k and the per-DC
# vnode-ownership replica read — never driver-proved; (1) queries whose
# IMPLEMENTATION this round touched: the streaming SemDeDup corpus-side
# pair join moved to int8 codes (semantic_stream.py), ivf_knn_join's
# use_codes phase 2 now rejoins on (cell, id) restricted to probed
# cells (ann_index.py duplicate-id parity fix), replicas.py casefolds
# DC names and indexes the validated rf map, and coordinated_bulk_write
# gained an optional consistency gate (bulk_writer.py); (2) the 15
# r8-stale names (five rounds stale after the idle r12 — VERDICT r12
# item 1 says these MUST lead round 13); (3) 25 of the 44 r9-cohort
# names — the complex-operator subset (TPC-H q1-q7, dedup, streaming,
# text, multimodal, sampling). The 19 deferred r9 names (pure
# expression/simple-SQL suites with in-window relatives and untouched
# implementations) are appended AFTER the window as dropout backfill
# and lead round 14. After r13 no registered query's newest driver row
# is older than r9.
_ROUND_PRIORITY: list[str] = [
    # --- (0) NEW this round: never driver-proved ---
    "ann_pq_topk",                   # product-quantization ADC top-k
    "replica_read_vnode",            # true per-DC vnode token ownership
    # --- (1) implementation touched this round ---
    "streaming_semantic_dedup_quantized",  # corpus join now ships int8 codes
    "streaming_semantic_dedup",            # shared stream body touched
    "ann_ivf_quantized_knn_join",    # use_codes phase-2 (cell,id) rejoin
    "ann_ivf_knn_join_exact",        # same entry point
    "ann_ivf_knn_join_string_ids",   # same path, string ids
    "replica_read_all",              # replicas.py casefold fix
    "replica_read_each_quorum",      # replicas.py validated-map fix
    "coordinated_write_roundtrip",   # coordinated write gained CL gate
    # --- (2) r8-stale cohort: five rounds without a driver row ---
    "acctbal_width_buckets",
    "array_agg_sorted",
    "array_function_suite",
    "bool_aggs",
    "conditional_agg_filter",
    "events_json_extract",
    "events_json_struct",
    "explode_embeddings",
    "map_entry_extraction",
    "null_handling_funcs",
    "pivot_returnflag_status",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "unpivot_segment_metrics",
    "window_ranking_functions",
    # --- (3) r9 cohort: complex-operator subset ---
    "decontaminate_benchmark",
    "dedup_boilerplate_segments",
    "dedup_cluster_assignment",
    "dedup_exact_docs",
    "dedup_minhash_confirmed",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_span_fraction",
    "events_sessionize",
    "hybrid_rrf_search",
    "mixture_sample_langs",
    "multimodal_blob_stats",
    "multimodal_image_features",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "streaming_stateful_profile",
    "text_bm25_search",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_tfidf_search",
    # --- past the 50-row window: deferred r9 names as dropout
    # backfill (lead round 14) ---
    "asof_purchase_click",
    "case_when_tiering",
    "date_trunc_variants",
    "distinct_part_attrs",
    "having_big_customers",
    "lww_latest_events",
    "lww_partial_upsert",
    "nested_map_clustering",
    "nested_struct_explode",
    "pk_in_list_pushdown",
    "range_join_error_bursts",
    "regexp_extract_groups",
    "rollup_time_hierarchy",
    "setop_except_all",
    "setop_intersect_all",
    "setop_union_by_name",
    "skew_salted_returnflag",
    "topk_global_orders",
    "train_val_test_split",
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
