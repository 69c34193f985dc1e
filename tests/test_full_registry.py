"""Full-registry correctness gate: EVERY registered query must pass its
DuckDB oracle (or rows-only check) at sf0.01 — the driver only gets
through ~50 registry entries per round, so this is the one command that
asserts the whole surface every time.

Excluded from the default `pytest tests/` run (see pytest.ini); invoke
explicitly:

    python -m pytest -m full_registry -q
    # or equivalently: python scripts/check_all.py /root/testdata/sf0.01
"""

from __future__ import annotations

import pytest

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded
from cassandra_analytics_spark.testing import compare_query

SF_DIR = "/root/testdata/sf0.01"


def _names() -> list[str]:
    _ensure_loaded()
    return list(REGISTRY)


@pytest.mark.full_registry
@pytest.mark.parametrize("name", _names())
def test_registered_query_matches_oracle(spark, name):
    res = compare_query(name, spark, SF_DIR)
    assert res.ok, str(res)
