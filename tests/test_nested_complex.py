"""B7 nested-complex types with nulls at every nesting level
(reference: ``EndToEndTests.java:885-1613``, ``testUdtsWithNulls:1833``):
set/list/map/tuple/UDT columns survive the write→merge→read path with
nested nulls intact."""

from __future__ import annotations

from pyspark.sql import Row

from cassandra_analytics_spark.schema import schema_for_ddl
from cassandra_analytics_spark.sinks.bulk_writer import bulk_write, read_bulk_table

NESTED_DDL = """
CREATE TYPE ks.address (street text, city text, zip int);
CREATE TABLE ks.nested_complex (
  id bigint PRIMARY KEY,
  tags set<text>,
  scores list<frozen<tuple<int, double>>>,
  attrs map<text, frozen<address>>,
  addr frozen<address>
);
"""


def _rows():
    return [
        # fully populated
        (1, ["a", "b"], [(1, 1.5), (2, 2.5)], {"home": ("main", "sf", 94105)},
         ("other", "la", 90001)),
        # nulls inside nested values
        (2, ["x"], [(3, None)], {"w": (None, "nyc", None)}, (None, None, None)),
        # null collections / null struct
        (3, None, None, None, None),
        # empty collections (distinct from null)
        (4, [], [], {}, ("s", "c", 1)),
    ]


def test_nested_complex_roundtrip(spark, tmp_path):
    schema = schema_for_ddl(NESTED_DDL)
    df = spark.createDataFrame(_rows(), schema)
    path = str(tmp_path / "nested")
    bulk_write(df, path, ["id"], write_timestamp_micros=1_000)
    out = {r.id: r for r in read_bulk_table(spark, path, ["id"]).collect()}

    assert out[1].tags == ["a", "b"]
    assert out[1].scores[1]["0"] == 2 and out[1].scores[1]["1"] == 2.5
    assert out[1].attrs["home"]["zip"] == 94105
    assert out[1].addr["city"] == "la"

    assert out[2].scores[0]["1"] is None  # null inside tuple
    assert out[2].attrs["w"]["street"] is None  # null inside UDT in map
    assert out[2].addr["zip"] is None

    assert out[3].tags is None and out[3].attrs is None and out[3].addr is None

    assert out[4].tags == [] and out[4].scores == [] and out[4].attrs == {}


def test_nested_lww_upsert(spark, tmp_path):
    schema = schema_for_ddl(NESTED_DDL)
    path = str(tmp_path / "nested")
    v1 = spark.createDataFrame(_rows(), schema)
    bulk_write(v1, path, ["id"], write_timestamp_micros=1_000)
    v2 = spark.createDataFrame(
        [(1, ["updated"], None, None, None)], schema
    )
    bulk_write(v2, path, ["id"], write_timestamp_micros=2_000)
    out = {r.id: r for r in read_bulk_table(spark, path, ["id"]).collect()}
    assert out[1].tags == ["updated"]  # row-level LWW replaces nested cols
    assert out[1].scores is None
    assert len(out) == 4
