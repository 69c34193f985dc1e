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
# (CORRECTNESS_r0{4,...,8}.json are each exactly the first 50 in
# registration order). To get every query a driver row across rounds,
# each round front-loads the names that most need one. Round-9 priority
# (VERDICT r8 item 1): (1) the FOUR new queries (IVF append equality,
# LSH append roundtrip, streaming SemDeDup, index kNN join) plus the
# queries whose implementation round 9 touched — the IVF-append/spec
# work, the assign_nearest_cells refactor under the SemDeDup family,
# the RRF filter-order + NULL-id fixes, and the mixture_sample
# validation pass; (2) the 40 names whose newest driver evidence is r6
# (the exact set VERDICT r8 computed by CORRECTNESS set difference).
# 8 + 40 = 48 of the 50-row window; after this round no query's newest
# driver row is older than r7.
_ROUND_PRIORITY: list[str] = [
    # --- (0) NEW this round: never driver-proved ---
    "dedup_semantic_append_index",   # IVF build+append == build-once
    "ann_lsh_append_topk",           # LSH build+append+read roundtrip
    "streaming_semantic_dedup",      # SemDeDup as a foreachBatch stream
    "ann_ivf_knn_join_exact",        # index-accelerated kNN join, probe-all
    # --- (1) implementation touched this round ---
    "dedup_semantic_on_index",       # layout now built via build_ivf_index
    "dedup_semantic",                # rides assign_nearest_cells now
    "hybrid_rrf_search",             # RRF filter order + NULL-id guard
    "mixture_sample_langs",          # non-finite weight / bad-size guards
    # (dedup_intradoc_segments / cosine_topk_embeddings /
    # dedup_incremental_lsh_confirmed keep their r8 rows — their
    # operators are untouched this round; the skew_observation threading
    # through minhash/simhash/embedding pair entry points is a NO-OP
    # when the parameter is absent — those queries keep their fresh
    # r8/r9 stale-rotation slots below where applicable)
    # --- (2) stale: newest driver evidence r6 ---
    "asof_purchase_click",
    "case_when_tiering",
    "date_trunc_variants",
    "decontaminate_benchmark",
    "dedup_boilerplate_segments",
    "dedup_cluster_assignment",
    "dedup_exact_docs",
    "dedup_minhash_confirmed",
    "dedup_ngram_jaccard",
    "dedup_span_fraction",
    "distinct_part_attrs",
    "events_sessionize",
    "having_big_customers",
    "multimodal_blob_stats",
    "multimodal_image_features",
    "nested_map_clustering",
    "nested_struct_explode",
    "pk_in_list_pushdown",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "range_join_error_bursts",
    "regexp_extract_groups",
    "replica_read_all",
    "rollup_time_hierarchy",
    "setop_except_all",
    "setop_intersect_all",
    "setop_union_by_name",
    "skew_salted_returnflag",
    "streaming_stateful_profile",
    "text_bm25_search",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_tfidf_search",
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
