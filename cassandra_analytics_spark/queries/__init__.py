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
# front-loads the names that most need one — a discipline enforced by
# tests/test_evidence_freshness.py (red when a name's newest driver
# row is >4 rounds old and it is not in the upcoming window).
# Round-16 priority (VERDICT r15 item 1): (0) NEW round-16 queries
# (never driver-proved names must lead the window); (1) the 18 names
# whose newest driver row is r12 — TPC-H q8/q9/q11-q16/q19-q22, the
# window suite and token_range_histogram — which hit the 4-round
# staleness boundary at r16; (2) 28 of the 46 r13-cohort names,
# complex-operator subset first (streaming, ANN/kNN-join, dedup,
# replicas, multimodal, text search), to amortize that cohort before
# it hits the boundary at r18. The remaining 18 r13 names (TPC-H
# q1-q7 + scalar/array/json suites, simple-SQL with untouched
# implementations) lead round 17. After r16 no registered query's
# newest driver row is older than r13.
_ROUND_PRIORITY: list[str] = [
    # --- (0) never driver-proved: new r16 queries ---
    "streaming_semantic_dedup_residual",   # r16: residual IVF-PQ stream bootstrap
    "ann_ivf_pq_residual_append_compact_topk",  # r16: residual+append+compact
    "ann_ivf_kmeans_topk",                 # r16: k-means coarse quantizer
    "streaming_pairs_compacted",           # r16: pairs-store compaction mid-stream
    # --- (1) r12 cohort: hits the staleness boundary this round (18) ---
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
    "token_range_histogram",
    "window_moving_avg",
    "window_percent_rank",
    "window_range_frame_revenue",
    "window_running_revenue",
    "window_topk_orders_per_customer",
    # --- (2) r13 cohort, complex-operator subset (28 of 46) ---
    "ann_ivf_knn_join_exact",
    "ann_ivf_knn_join_string_ids",
    "coordinated_write_roundtrip",
    "decontaminate_benchmark",
    "dedup_boilerplate_segments",
    "dedup_cluster_assignment",
    "dedup_exact_docs",
    "dedup_minhash_confirmed",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_span_fraction",
    "events_json_extract",
    "events_json_struct",
    "events_sessionize",
    "explode_embeddings",
    "hybrid_rrf_search",
    "mixture_sample_langs",
    "multimodal_blob_stats",
    "multimodal_image_features",
    "replica_read_all",
    "replica_read_each_quorum",
    "replica_read_vnode",
    "streaming_stateful_profile",
    "text_bm25_search",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_tfidf_search",
    "unpivot_segment_metrics",
    # --- past the 50-row window: the remaining 18 r13 names as
    # dropout backfill (lead round 17) ---
    "acctbal_width_buckets",
    "array_agg_sorted",
    "array_function_suite",
    "bool_aggs",
    "conditional_agg_filter",
    "map_entry_extraction",
    "null_handling_funcs",
    "pivot_returnflag_status",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "window_ranking_functions",
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
