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


# ---------------------------------------------------------------------------
# gc_grace shield property (round 6): compaction at clock T must preserve
# exactly Cassandra's visibility semantics against stale re-ingests.
# ---------------------------------------------------------------------------

_ttl_versions = st.lists(
    st.tuples(
        st.integers(0, 3),                      # key
        st.integers(1, 100),                    # writetime micros
        st.sampled_from([None, 1, 1_000_000]),  # ttl: none / expired@T / live@T
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ttl_versions)
def test_compaction_shield_property(spark, tmp_path_factory, rows):
    """After compact_table at clock T and a stale re-ingest (writetime 0):
    (a) the max-writetime NON-expired version wins iff it out-timestamps
    every expired version's implicit tombstone, (b) a key with ANY
    expired version never resurrects via the stale write (the shield),
    (c) a key never written before shows the stale row. One clock T for
    compaction AND reads — the ADVICE r6 single-clock contract."""
    from cassandra_analytics_spark.sinks.bulk_writer import (
        bulk_write,
        compact_table,
        read_bulk_table,
    )

    T = 200_000_000  # micros; 1s TTLs are long expired, 1e6 s TTLs live
    path = str(tmp_path_factory.mktemp("shield") / "tbl")
    df = spark.createDataFrame(
        [(k, f"v{i}", wt, ttl) for i, (k, wt, ttl) in enumerate(rows)],
        "k int, v string, writetime long, ttl int",
    )
    bulk_write(df, path, ["k"])
    compact_table(spark, path, ["k"], now_micros=T)
    # stale re-ingest for every key incl. one never written (key 4)
    bulk_write(
        spark.createDataFrame([(k, "stale") for k in range(5)], "k int, v string"),
        path, ["k"], write_timestamp_micros=0,
    )
    got = {r.k: r.v for r in read_bulk_table(spark, path, ["k"], now_micros=T).collect()}

    expected = {}
    by_key: dict = {}
    for i, (k, wt, ttl) in enumerate(rows):
        by_key.setdefault(k, []).append((f"v{i}", wt, ttl))
    for k in range(5):
        hist = by_key.get(k, [])
        expired_wts = [wt for _, wt, ttl in hist if ttl is not None and wt + ttl * 1_000_000 <= T]
        live = [(v, wt) for v, wt, ttl in hist if ttl is None or wt + ttl * 1_000_000 > T]
        shield = max(expired_wts, default=-1)
        survivors = [(wt, v) for v, wt in live if wt > shield]
        if survivors:
            # LWW among surviving versions; ties break to the greater
            # value tuple (generator never produces duplicate values)
            expected[k] = max(survivors)[1]
        elif expired_wts:
            pass  # shielded: the stale (wt=0) write stays shadowed
        else:
            expected[k] = "stale"  # never-written key: stale row visible
    assert got == expected
