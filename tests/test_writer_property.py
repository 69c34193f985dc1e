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


# ---------------------------------------------------------------------------
# Randomized multi-batch upsert round-trip — the reference's EndToEndTests
# backbone (write several generations, read back, last-write-wins per
# CELL) against a Python reconciliation model.
# ---------------------------------------------------------------------------

upsert_batches = st.lists(  # each batch: list of (key, a-or-None, b-or-None)
    st.lists(
        st.tuples(
            st.integers(0, 4),
            st.one_of(st.none(), st.integers(0, 99)),
            st.one_of(st.none(), st.integers(0, 99)),
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(upsert_batches)
def test_multibatch_upsert_roundtrip_cell_lww(spark, tmp_path_factory, batches):
    path = str(tmp_path_factory.mktemp("prop_upsert") / "tbl")
    model: dict = {}
    for wt, batch in enumerate(batches, start=1):
        # one batch may hit the same key twice; within a batch the write
        # timestamp ties and Cassandra reconciliation takes the greater
        # value — drop in-batch duplicates (keep the LAST row per key) to
        # keep the model simple and the batch a valid upsert set
        dedup = {}
        for k, a, b in batch:
            dedup[k] = (a, b)
        rows = [(k, a, b) for k, (a, b) in dedup.items()]
        df = spark.createDataFrame(rows, "k int, a int, b int")
        bulk_write(df, path, ["k"], write_timestamp_micros=wt * 1000)
        for k, a, b in rows:
            cur = model.setdefault(k, [None, None])
            if a is not None:
                cur[0] = a
            if b is not None:
                cur[1] = b
    out = read_bulk_table(spark, path, ["k"], cell_lww=True)
    got = {r.k: (r.a, r.b) for r in out.collect()}
    assert got == {k: tuple(v) for k, v in model.items()}
