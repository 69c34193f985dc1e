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


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


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
