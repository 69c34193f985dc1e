"""as-of join edge cases beyond the oracle query."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from cassandra_analytics_spark.operators.asof import asof_join, range_join_pairs


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _sides(spark):
    left = spark.createDataFrame(
        [
            Row(k="u1", lid=1, ts=_ts("2024-01-01T10:00:00")),
            Row(k="u1", lid=2, ts=_ts("2024-01-01T12:00:00")),
            Row(k="u2", lid=3, ts=_ts("2024-01-01T09:00:00")),  # no prior right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="u1", ts=_ts("2024-01-01T09:30:00"), price=10.0),
            Row(k="u1", ts=_ts("2024-01-01T11:00:00"), price=20.0),
            Row(k="u2", ts=_ts("2024-01-01T09:30:00"), price=30.0),
        ]
    )
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_value_cols=["price"],
    )
    got = {r.lid: (r.ts_asof, r.price_asof) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01T09:30:00"), 10.0)
    assert got[2] == (_ts("2024-01-01T11:00:00"), 20.0)
    assert got[3] == (None, None)  # u2 has no right row at or before 09:00


def test_asof_forward(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_value_cols=["price"], direction="forward",
    )
    got = {r.lid: r.price_asof for r in out.collect()}
    assert got[1] == 20.0  # next right at 11:00
    assert got[2] is None  # nothing after 12:00
    assert got[3] == 30.0


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([Row(k="a", lid=1, ts=_ts("2024-01-01T10:00:00"))])
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts("2024-01-01T10:00:00"), price=1.5)]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_value_cols=["price"],
    ).collect()
    assert out[0].price_asof == 1.5  # <= is inclusive


def test_range_join_exact_boundaries(spark):
    rows = [
        Row(k=1, i=1, ts=_ts("2024-01-01T00:00:00")),
        Row(k=1, i=2, ts=_ts("2024-01-01T00:04:59")),  # within 5 min of i=1
        Row(k=1, i=3, ts=_ts("2024-01-01T00:05:00")),  # exactly 5 min from i=1
        Row(k=1, i=4, ts=_ts("2024-01-01T00:20:00")),  # out of range of all
        Row(k=2, i=5, ts=_ts("2024-01-01T00:00:00")),  # different key
    ]
    df = spark.createDataFrame(rows)
    pairs = range_join_pairs(df, key="k", ts="ts", id_col="i", max_gap_seconds=300)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_asof_null_value_in_nearest_row_is_not_backfilled(spark):
    """The carried columns must come from ONE right row: a NULL cell in
    the nearest match must stay NULL, not be backfilled from an older
    right row (per-column last(ignorenulls) built frankenstein rows)."""
    left = spark.createDataFrame([Row(k="u1", lid=1, ts=_ts("2024-01-01T12:00:00"))])
    right = spark.createDataFrame(
        [
            Row(k="u1", ts=_ts("2024-01-01T10:00:00"), price=5.0, qty=7),
            Row(k="u1", ts=_ts("2024-01-01T11:00:00"), price=None, qty=9),
        ],
        "k string, ts timestamp, price double, qty int",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_value_cols=["price", "qty"],
    ).collect()[0]
    assert out.ts_asof == _ts("2024-01-01T11:00:00")
    assert out.qty_asof == 9
    assert out.price_asof is None  # NOT 5.0 from the older row


def test_asof_duplicate_right_timestamps_deterministic(spark):
    """Two right rows at the SAME (key, ts): the greatest value tuple
    wins deterministically (the LWW merge's equal-writetime convention)
    — without the tiebreak the winner depended on shuffle order."""
    from cassandra_analytics_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, lts long")
    right = spark.createDataFrame(
        [(1, 50, "alpha"), (1, 50, "zeta"), (1, 50, "mid")],
        "k int, rts long, v string",
    )
    for _ in range(3):  # stable across repeated executions
        out = asof_join(
            left.repartition(8), right.repartition(8), ["k"],
            left_ts="lts", right_ts="rts", right_value_cols=["v"],
        ).collect()
        assert len(out) == 1
        assert out[0].v_asof == "zeta"  # greatest (rts, v) tuple


def test_null_timestamps_never_match(spark):
    """SQL three-valued comparison semantics: a NULL-ts right row can
    satisfy neither inequality, and a NULL-ts left row matches nothing.
    The window formulation needs explicit handling for both (round-7
    hostile pass): null right rows sorted FIRST and were carried into
    every left row; null left rows in forward mode sorted LAST and
    picked up a bogus match."""
    from cassandra_analytics_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, None)], "k INT, lts LONG"
    )
    right = spark.createDataFrame(
        [(1, None, "null-ts"), (1, 50, "real")], "k INT, rts LONG, v STRING"
    )
    back = {
        (r.k, r.lts): (r.rts_asof, r.v_asof)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["v"], direction="backward"
        ).collect()
    }
    assert back[(1, 100)] == (50, "real")   # not the null-ts row
    assert back[(1, None)] == (None, None)  # null left ts matches nothing

    fwd = {
        (r.k, r.lts): (r.rts_asof, r.v_asof)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["v"], direction="forward"
        ).collect()
    }
    assert fwd[(1, 100)] == (None, None)    # no right at ts >= 100
    assert fwd[(1, None)] == (None, None)


def test_asof_output_name_collision_is_loud(spark):
    """Round-9 executed probe: a left column named like a generated
    output (<carried><suffix>) produced a DUPLICATE column name in the
    result — ambiguous for every downstream select. Named error now."""
    import pytest

    from cassandra_analytics_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1)], "k string, ts int, rts_asof int"
    )
    right = spark.createDataFrame([("a", 5, 100)], "k string, rts int, val int")
    with pytest.raises(ValueError, match="name collision"):
        asof_join(left, right, ["k"], "ts", "rts", ["val"])
    # a different suffix resolves it
    out = asof_join(left, right, ["k"], "ts", "rts", ["val"], suffix="_r")
    assert sorted(out.columns) == ["k", "rts_asof", "rts_r", "ts", "val_r"]
