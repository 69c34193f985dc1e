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
# (CORRECTNESS_r0{4,5,6,7}.json are each exactly the first 50 in
# registration order). To get every query a driver row across rounds,
# each round front-loads the names that most need one. Round-8 priority
# (VERDICT r7 item 1): (1) the queries whose implementation round 8
# touched — the map-payload canonical tiebreak (merge / asof /
# cell_pivot / bulk-writer sort) and the dedup-index restart-recovery +
# spec-pin fixes; (2) the 40 names whose newest driver evidence is r5
# (computed by CORRECTNESS_r05-07 set difference). 10 + 40 = exactly
# the 50-row window; after this round no query's newest driver row is
# older than r6.
_ROUND_PRIORITY: list[str] = [
    # --- (0) NEW this round: never driver-proved ---
    "dedup_semantic",                # SemDeDup cluster-then-dedup
    "dedup_semantic_on_index",       # same, off a persisted IVF layout
    "mixture_sample_langs",          # domain-mixture hash sampling
    "hybrid_rrf_search",             # BM25+cosine reciprocal-rank fusion
    "dedup_intradoc_segments",       # C4-style intra-doc repetition removal
    # --- (1) implementation touched this round ---
    "lww_latest_events",             # row-LWW tiebreak via order_key_expr
    "lww_partial_upsert",            # cell-LWW tiebreak via order_key_expr
    "bulk_write_roundtrip",          # value-column sort via order_key_expr
    # (bundle_write_restore / coordinated_write_roundtrip ride the SAME
    # order_key_expr writer sort as bulk_write_roundtrip, have r7 driver
    # rows and dedicated property suites — their slots go to the two
    # r6-fresh queries the round-8 continuation touched instead.
    # cell_pivot_roundtrip / asof_purchase_click /
    # static_column_propagation are the remaining three order_key_expr
    # sites: same mechanism as the three rows kept above, r7 driver rows,
    # pinned by tests/test_map_determinism.py — their slots go to the
    # three NEW queries. embedding_near_dup_confirmed's _planted_corpus
    # factor-out was proved hash-identical by this session's sf0.01
    # compare and keeps its r7 row.)
    "cosine_topk_embeddings",        # top-k now excludes unscorable rows
    # (dedup_cluster_assignment keeps its r6 driver row — within the
    # freshness criterion — and its r8 NULL-edge fix is pinned by
    # tests/test_graph.py; untouched by this continuation, so its slot
    # goes to the 5th new query. streaming_incremental_dedup's r8 change
    # is RESTART-path behavior:
    # a fresh driver run cannot exercise it — the restart bootstrap is
    # pinned by tests/test_dedup_stream.py, the query itself has an r7
    # hash-matched row; its slot goes to the 4th new query)
    "dedup_incremental_lsh_confirmed",  # spec pin on append-bootstrap
    # --- (2) stale: newest driver evidence r5 ---
    "acctbal_width_buckets",
    "agg_median_percentiles",
    "array_agg_sorted",
    "array_function_suite",
    "bool_aggs",
    "conditional_agg_filter",
    "dedup_incremental_lsh",
    "dedup_incremental_pipeline",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_hourly_stats",
    "events_json_extract",
    "events_json_struct",
    "explode_embeddings",
    "map_entry_extraction",
    "null_handling_funcs",
    "pack_greedy_bins",
    "pivot_returnflag_status",
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
    "q8_market_share",
    "q9_product_type_profit",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "stat_moments_lineitem",
    "stratified_hash_sample_langs",
    "streaming_interval_join",
    "streaming_sessionize",
    "unpivot_segment_metrics",
    "window_percent_rank",
    "window_range_frame_revenue",
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
