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
# Round-17 priority (VERDICT r16 item 7): (1) the 18 names whose
# newest driver row is r13 — TPC-H q1-q7 + the scalar/array/json
# suites — which hit the 4-round staleness boundary at r18 and were
# queued "lead round 17" by the r16 rotation; (2) 32 of the 50
# r14-cohort names, complex-operator subset first (the ANN/PQ family,
# the streaming family, dedup/embedding confirms, the training-data
# pipeline and text paths — including the two spread_scan-touched
# queries lang_id_heuristic / text_token_stats so the r17 plan change
# gets a driver row — plus the benched temporal/LWW trio). The
# remaining 18 r14 names (simple-SQL: case_when/date_trunc/setop_all
# suites and the untouched cassandra-semantics scalars) lead round 18
# together with the r15 cohort. After r17 no registered query's
# newest driver row is older than r14.
_ROUND_PRIORITY: list[str] = [
    # --- (1) r13 cohort: hits the staleness boundary at r18 (18) ---
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
    # --- (2) r14 cohort, complex-operator subset (32 of 50) ---
    "ann_ivf_pq_append_topk",
    "ann_ivf_pq_knn_join",
    "ann_ivf_pq_topk",
    "ann_ivf_quantized_knn_join",
    "ann_ivf_topk",
    "ann_pq_append_topk",
    "ann_pq_index_topk",
    "ann_pq_topk",
    "streaming_hourly_stats",
    "streaming_incremental_dedup",
    "streaming_semantic_dedup",
    "streaming_semantic_dedup_pq",
    "streaming_semantic_dedup_quantized",
    "dedup_fingerprint_md5",
    "dedup_simhash_confirmed",
    "embedding_near_dup",
    "embedding_near_dup_confirmed",
    "embedding_label_norms",
    "bundle_write_restore",
    "cell_pivot_roundtrip",
    "pack_training_chunks",
    "corpus_budget_select",
    "train_val_test_split",
    "training_data_pipeline",
    "stratified_sample_langs",
    "text_bpe_tokens",
    "text_quality_features",
    "lang_id_heuristic",
    "text_token_stats",
    "asof_purchase_click",
    "range_join_error_bursts",
    "lww_latest_events",
    # --- past the 50-row window: the remaining 18 r14 names as
    # dropout backfill (lead round 18) ---
    "case_when_tiering",
    "date_trunc_variants",
    "distinct_part_attrs",
    "having_big_customers",
    "regexp_extract_groups",
    "rollup_time_hierarchy",
    "setop_except_all",
    "setop_intersect_all",
    "setop_union_by_name",
    "lww_partial_upsert",
    "lmt_last_modified",
    "nested_map_clustering",
    "nested_struct_explode",
    "pk_in_list_pushdown",
    "skew_salted_returnflag",
    "static_column_propagation",
    "topk_global_orders",
    "partition_size_orders",
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
