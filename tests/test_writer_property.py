"""Property-based writer round-trip: arbitrary small tables survive
bulk_write → read unchanged (multiset equality, nulls included)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_analytics_spark.sinks.bulk_writer import bulk_write, read_bulk_table

rows_strategy = st.lists(
    st.tuples(
        st.integers(-(2**40), 2**40),  # v_long
        st.one_of(st.none(), st.text(alphabet="abcXYZ 0_", max_size=12)),  # v_str
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=64)),  # v_double
        st.booleans(),  # v_bool
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_roundtrip_preserves_rows(spark, tmp_path_factory, rows):
    # unique synthetic key per row so LWW merge is the identity
    data = [(i,) + r for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k int, v_long long, v_str string, v_double double, v_bool boolean"
    )
    path = str(tmp_path_factory.mktemp("prop") / "tbl")
    bulk_write(df, path, ["k"], write_timestamp_micros=1)
    out = read_bulk_table(spark, path, ["k"])
    got = sorted(
        (r.k, r.v_long, r.v_str, r.v_double, r.v_bool) for r in out.collect()
    )
    assert got == sorted(data)
