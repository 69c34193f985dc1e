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
# front-loads the names that most need one — a discipline now enforced
# by tests/test_evidence_freshness.py (red when a name's newest driver
# row is >4 rounds old and it is not in the upcoming window).
# Round-14 priority (VERDICT r13 items 1-3, 6): (0) never
# driver-proved — the two PQ-layout queries registered past the r13
# window plus the four NEW r14 queries (PQ append roundtrips, the
# IVF-PQ kNN join completing the composition matrix, and the streaming
# PQ SemDeDup); (1) queries whose IMPLEMENTATION round 14 touched: the
# PQ codebook now trains on a seeded-hash random sample and pq_adc_topk
# gained the code-range guard (ann_pq_topk), ivf_knn_join's use_codes
# phase 2 attaches the query payload AFTER the corpus join (r13 ADVICE
# medium — ann_ivf_quantized_knn_join), and semantic_stream.py gained
# the pq= scheme branch (both existing streaming SemDeDup names); (2)
# the 19 r9-deferred names (5 rounds stale at r14 — MUST lead, the
# r13 hand-off); (3) 21 of the 43 r10-cohort names — the
# complex-operator subset (layout roundtrips, streaming, text,
# embedding, packing). The 22 remaining r10 names (simple-SQL
# agg/join/setop/window suites with untouched implementations) are
# appended AFTER the window as dropout backfill and lead round 15.
# After r14 no registered query's newest driver row is older than r10.
_ROUND_PRIORITY: list[str] = [
    # --- (0) never driver-proved: r13 past-window + new r14 names ---
    "ann_pq_index_topk",             # persisted flat-PQ layout read
    "ann_ivf_pq_topk",               # persisted IVF-PQ layout probe
    "ann_pq_append_topk",            # r14: flat-PQ append roundtrip
    "ann_ivf_pq_append_topk",        # r14: IVF-PQ append roundtrip
    "ann_ivf_pq_knn_join",           # r14: kNN join over IVF-PQ codes
    "streaming_semantic_dedup_pq",   # r14: streaming SemDeDup on PQ
    # --- (1) implementation touched this round ---
    "ann_pq_topk",                   # random training sample + ks guard
    "ann_ivf_quantized_knn_join",    # thin phase-2 payload join
    "streaming_semantic_dedup",            # stream body gained pq= branch
    "streaming_semantic_dedup_quantized",  # same body, SQ8 scheme
    # --- (2) r9-deferred cohort: five rounds stale, must lead ---
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
    # --- (3) r10 cohort, complex-operator subset (21 of 43) ---
    "ann_ivf_topk",
    "bundle_write_restore",
    "cell_pivot_roundtrip",
    "corpus_budget_select",
    "dedup_fingerprint_md5",
    "dedup_simhash_confirmed",
    "embedding_label_norms",
    "embedding_near_dup",
    "embedding_near_dup_confirmed",
    "lang_id_heuristic",
    "lmt_last_modified",
    "pack_training_chunks",
    "partition_size_orders",
    "static_column_propagation",
    "stratified_sample_langs",
    "streaming_hourly_stats",
    "streaming_incremental_dedup",
    "text_bpe_tokens",
    "text_quality_features",
    "text_token_stats",
    "training_data_pipeline",
    # --- past the 50-row window: remaining r10 names as dropout
    # backfill (lead round 15) ---
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
    "scalar_string_funcs",
    "setop_except_customers",
    "setop_intersect_customers",
    "setop_union_segments",
    "sql_grouping_sets",
    "streaming_dedup_union",
    "window_lag_order_gap",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
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
