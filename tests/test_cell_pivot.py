"""M2 cell→row pivot: sparse timestamped cells → rows with per-cell LWW."""

from __future__ import annotations

from pyspark.sql import Row

from cassandra_analytics_spark.operators.cell_pivot import (
    ROW_MARKER,
    cell_pivot,
    rows_to_cells,
)

CELL_SCHEMA = "pk string, ck int, column string, value string, writetime long"


def test_pivot_basic_and_cell_lww(spark):
    cells = spark.createDataFrame(
        [
            ("a", 1, "name", "old", 100),
            ("a", 1, "name", "new", 200),  # newer cell wins
            ("a", 1, "score", "10", 100),
            ("b", 2, "name", "solo", 50),
        ],
        CELL_SCHEMA,
    )
    out = cell_pivot(cells, ["pk"], ["ck"], columns=["name", "score"])
    got = {(r.pk, r.ck): (r.name, r.score) for r in out.collect()}
    assert got == {("a", 1): ("new", "10"), ("b", 2): ("solo", None)}


def test_row_marker_keeps_key_only_rows(spark):
    cells = spark.createDataFrame(
        [
            ("a", 1, ROW_MARKER, "", 100),  # INSERT with only primary key
            ("b", 1, "v", "x", 100),
        ],
        CELL_SCHEMA,
    )
    out = cell_pivot(cells, ["pk"], ["ck"], columns=["v"])
    got = {(r.pk, r.ck): r.v for r in out.collect()}
    assert got == {("a", 1): None, ("b", 1): "x"}  # key-only row survives


def test_partial_rows(spark):
    # UPDATE-created partial rows: only written cells exist
    cells = spark.createDataFrame(
        [
            ("a", 1, "x", "1", 100),
            ("a", 2, "y", "2", 100),
        ],
        CELL_SCHEMA,
    )
    out = cell_pivot(cells, ["pk"], ["ck"], columns=["x", "y"])
    got = {(r.pk, r.ck): (r.x, r.y) for r in out.collect()}
    assert got == {("a", 1): ("1", None), ("a", 2): (None, "2")}


def test_rows_to_cells_roundtrip(spark):
    rows = spark.createDataFrame(
        [
            Row(pk="a", ck=1, name="n1", score="s1", writetime=100),
            Row(pk="a", ck=2, name="n2", score=None, writetime=100),
        ]
    )
    cells = rows_to_cells(rows, ["pk"], ["ck"])
    back = cell_pivot(cells, ["pk"], ["ck"], columns=["name", "score"])
    got = {(r.pk, r.ck): (r.name, r.score) for r in back.collect()}
    assert got == {("a", 1): ("n1", "s1"), ("a", 2): ("n2", None)}


def test_writetime_tie_resolves_greatest_value(spark):
    """Cassandra reconciles equal-timestamp cells by comparing values
    (greater wins); a bare max_by(value, writetime) would keep whichever
    tied cell a task saw first (round-7 hostile pass)."""
    from cassandra_analytics_spark.operators.cell_pivot import cell_pivot

    cells = spark.createDataFrame(
        [
            (1, "v", "aaa", 100),
            (1, "v", "zzz", 100),  # same writetime — zzz must win
            (2, "v", "zzz", 100),
            (2, "v", "aaa", 100),  # order flipped — same winner
        ],
        "pk INT, column STRING, value STRING, writetime LONG",
    )
    got = {
        r.pk: r.v
        for r in cell_pivot(cells, ["pk"], columns=["v"]).collect()
    }
    assert got == {1: "zzz", 2: "zzz"}
