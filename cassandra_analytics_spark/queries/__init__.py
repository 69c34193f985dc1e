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
# the names that most need one. After r1..r3 the union covers all
# registered queries, so round-4 priority is: (1) the two entries whose
# only driver row was unusable (agg_approx_quantile errored on its array
# column — now flattened; embedding_near_dup recorded 0 rows — now
# seeded), (2) every query whose implementation changed this round
# (packing checkpoint, LSH hot-bucket cap, executor-side bundling,
# streaming tz pin) plus queries NEW this round, (3) a pad of names
# whose only green row is from r1 — re-proving the oldest evidence.
_ROUND_PRIORITY: list[str] = [
    # --- (1) never had a usable driver row ---
    "agg_approx_quantile",     # r3 err: array col; now scalar p50/p95/p99
    "embedding_near_dup",      # r1 row was 0 rows; now returns matches
    # --- (2) new this round / implementation touched this round ---
    "dedup_incremental_pipeline",
    "streaming_incremental_dedup",
    "corpus_budget_select",
    "coordinated_write_roundtrip",
    "pack_training_chunks",    # distributed_cumsum checkpoint fix
    "dedup_incremental_lsh",   # hot-bucket cap
    "bundle_write_restore",    # executor-side bundling
    "streaming_hourly_stats",  # events_stream tz pin
    "streaming_sessionize",
    "streaming_dedup_union",
    "streaming_interval_join",
    "agg_hll_sketch_union",    # rows-only; only r3 rows-only row
    # --- (3) pad: oldest evidence first (green only in r1) ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_fingerprint_md5",
    "training_data_pipeline",
    "text_tfidf_search",
    "text_token_stats",
    "text_quality_features",
    "text_bpe_tokens",
    "lang_id_heuristic",
    "embedding_label_norms",
    "stratified_sample_langs",
    "ann_ivf_topk",
    "lmt_last_modified",
    "partition_size_orders",
    "token_range_histogram",
    "static_column_propagation",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "agg_cube_status",
    "agg_rollup_orders_time",
    "sql_grouping_sets",
    "agg_distinct_suppliers",
    "agg_approx_distinct",
    "window_topk_orders_per_customer",
    "window_lag_order_gap",
    "window_running_revenue",
    "window_moving_avg",
    "setop_intersect_customers",
    "setop_except_customers",
    "setop_union_segments",
    "join_semi_open_orders",
    "join_anti_no_orders",
    "join_full_outer_nation_counts",
    "join_cross_region_status",
    "scalar_string_funcs",
    "scalar_date_funcs",
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
