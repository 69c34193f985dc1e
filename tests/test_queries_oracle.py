"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded
from cassandra_analytics_spark.testing import compare_query

_ensure_loaded()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name: str, spark, sf_dir: str) -> None:
    result = compare_query(name, spark, sf_dir)
    assert result.ok, str(result)
    assert result.spark_rows > 0, f"{name}: empty result"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name: str, spark, sf_dir: str) -> None:
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert df.schema is not None
