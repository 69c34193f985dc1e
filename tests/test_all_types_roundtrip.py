"""All-types write→read round-trip (FIXTURES.md §B3; reference
``EndToEndTests.java testAllDataTypesPartitionKey:205 /
testAllDataTypesValueColumn:224``): every supported CQL type with boundary
values survives the bulk write + merge-on-read path unchanged."""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import types as T

from cassandra_analytics_spark.schema import schema_for_ddl
from cassandra_analytics_spark.sinks.bulk_writer import bulk_write, read_bulk_table

ALL_TYPES_DDL = """
CREATE TYPE ks.addr (street text, zip int);
CREATE TABLE ks.all_types (
  id bigint PRIMARY KEY,
  c_ascii ascii,
  c_bigint bigint,
  c_blob blob,
  c_boolean boolean,
  c_date date,
  c_decimal decimal,
  c_double double,
  c_float float,
  c_int int,
  c_smallint smallint,
  c_text text,
  c_timestamp timestamp,
  c_tinyint tinyint,
  c_uuid uuid,
  c_varint varint,
  c_list list<int>,
  c_set set<text>,
  c_map map<text, int>,
  c_tuple frozen<tuple<int, text>>,
  c_udt frozen<addr>
);
"""


def _rows():
    return [
        (
            1,
            "ascii",
            9_223_372_036_854_775_807,  # bigint max
            b"\x00\xff\x10",
            True,
            datetime.date(1969, 12, 31),  # pre-epoch date
            decimal.Decimal("1234567890123456789.123456789"),
            1.7976931348623157e308,
            3.14,
            -2_147_483_648,  # int min
            -32_768,
            "",
            datetime.datetime(2024, 2, 29, 23, 59, 59, 999999),
            127,
            "123e4567-e89b-12d3-a456-426614174000",
            decimal.Decimal(2) ** 100,
            [1, 2, 3],
            ["a", "b"],
            {"k": 1},
            (42, "tup"),
            ("main st", 94105),
        ),
        (
            2,
            None, None, None, None, None, None, None, None, None, None,
            None, None, None, None, None, None, None, None, None, None,
        ),
    ]


def test_all_types_roundtrip(spark, tmp_path):
    schema = schema_for_ddl(ALL_TYPES_DDL)
    # verify the type mapping of the struct
    f = {x.name: x.dataType for x in schema.fields}
    assert isinstance(f["c_decimal"], T.DecimalType)
    assert f["c_decimal"].precision == 38 and f["c_decimal"].scale == 19
    assert isinstance(f["c_uuid"], T.StringType)
    assert isinstance(f["c_udt"], T.StructType)

    df = spark.createDataFrame(_rows(), schema)
    path = str(tmp_path / "all_types")
    bulk_write(df, path, ["id"], write_timestamp_micros=1_000)
    out = read_bulk_table(spark, path, ["id"])
    got = {r.id: r for r in out.collect()}
    assert set(got) == {1, 2}

    r1 = got[1]
    assert r1.c_ascii == "ascii"
    assert r1.c_bigint == 9_223_372_036_854_775_807
    assert bytes(r1.c_blob) == b"\x00\xff\x10"
    assert r1.c_boolean is True
    assert r1.c_date == datetime.date(1969, 12, 31)
    assert r1.c_decimal == decimal.Decimal("1234567890123456789.1234567890000000000")
    assert r1.c_double == 1.7976931348623157e308
    assert abs(r1.c_float - 3.14) < 1e-6
    assert r1.c_int == -2_147_483_648
    assert r1.c_smallint == -32_768
    assert r1.c_text == ""
    assert r1.c_timestamp == datetime.datetime(2024, 2, 29, 23, 59, 59, 999999)
    assert r1.c_tinyint == 127
    assert r1.c_uuid == "123e4567-e89b-12d3-a456-426614174000"
    assert r1.c_varint == decimal.Decimal(2) ** 100
    assert r1.c_list == [1, 2, 3]
    assert r1.c_set == ["a", "b"]
    assert r1.c_map == {"k": 1}
    assert r1.c_tuple["0"] == 42 and r1.c_tuple["1"] == "tup"
    assert r1.c_udt["street"] == "main st" and r1.c_udt["zip"] == 94105

    r2 = got[2]  # all-null row survives with nulls intact
    assert all(
        getattr(r2, c) is None
        for c in out.columns
        if c not in ("id",)
    )
