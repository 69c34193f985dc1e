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
# Round-15 priority (VERDICT r14 item 1): (0) the two NEW round-15
# layout-compaction queries (never driver-proved names must lead the
# window); (1) the 22 names whose newest driver row is r10 — the
# oldest cohort in the repo, the r14 hand-off ("lead round 15"), one
# round from the staleness boundary; (2) 26 of the 43 r12-cohort
# names — the complex-operator subset (persisted-layout roundtrips,
# incremental dedup, quantized top-k, streaming, sketches), scheduled
# now to amortize the cohort before it hits the boundary at r17
# (VERDICT r14: "schedule ~28 of them now"). The remaining 17 r12
# names (TPC-H q8-q22 + the window suite, all simple-SQL with
# untouched implementations) lead round 16. After r15 no registered
# query's newest driver row is older than r12.
_ROUND_PRIORITY: list[str] = [
    # --- (0) never driver-proved: new r15 queries ---
    "ann_pq_compact_topk",           # r15: flat-PQ compaction roundtrip
    "ann_ivf_pq_compact_topk",       # r15: IVF-PQ cell-kept compaction
    "ann_ivf_pq_residual_topk",      # r15: FAISS IVF-ADC residual encoding
    # --- (1) r10 cohort: oldest driver rows in the repo (22) ---
    "agg_approx_distinct",
    "agg_approx_distinct_bounded",
    "agg_approx_quantile",
    "agg_approx_quantile_bounded",
    "agg_cube_status",
    "agg_distinct_suppliers",
    "agg_hll_sketch_union_bounded",
    "agg_rollup_orders_time",
    "join_anti_no_orders",
    "join_cross_region_status",
    "join_full_outer_nation_counts",
    "join_semi_open_orders",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "scalar_string_funcs",
    "setop_except_customers",
    "setop_intersect_customers",
    "setop_union_segments",
    "sql_grouping_sets",
    "streaming_dedup_union",
    "window_lag_order_gap",
    # --- (2) r12 cohort, complex-operator subset (26 of 43) ---
    "agg_hll_sketch_union",
    "agg_median_percentiles",
    "ann_ivf_quantized_topk",
    "ann_lsh_append_topk",
    "bulk_write_roundtrip",
    "cosine_topk_embeddings",
    "decontaminate_bloom",
    "dedup_incremental_lsh",
    "dedup_incremental_lsh_confirmed",
    "dedup_incremental_pipeline",
    "dedup_intradoc_segments",
    "dedup_minhash_lsh",
    "dedup_semantic_append_index",
    "dedup_semantic_on_index",
    "dedup_semantic_on_index_quantized",
    "dedup_simhash",
    "embedding_quantize_stats",
    "events_hourly_stats",
    "pack_greedy_bins",
    "quantized_topk_join_rescored",
    "quantized_topk_rescored",
    "stat_moments_lineitem",
    "stratified_hash_sample_langs",
    "streaming_interval_join",
    "streaming_sessionize",
    "token_range_histogram",
    # --- past the 50-row window: the remaining 17 r12 names as
    # dropout backfill (lead round 16) ---
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
    "window_moving_avg",
    "window_percent_rank",
    "window_range_frame_revenue",
    "window_running_revenue",
    "window_topk_orders_per_customer",
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
