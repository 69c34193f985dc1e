from __future__ import annotations

import pytest

from cassandra_analytics_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = get_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
