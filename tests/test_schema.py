"""CQL DDL → StructType translator (C1/C2) against reference-style DDL."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cassandra_analytics_spark.schema import (
    UnsupportedCqlType,
    parse_cql_type,
    parse_create_table,
    schema_for_ddl,
)

BASIC = """
CREATE TABLE ks.basic_test (
  a bigint PRIMARY KEY,
  b bigint,
  c text
);
"""

COMPOUND = """
CREATE TABLE ks.compound (
  pk1 text,
  pk2 int,
  ck1 timestamp,
  ck2 text,
  s text STATIC,
  val double,
  PRIMARY KEY ((pk1, pk2), ck1, ck2)
) WITH CLUSTERING ORDER BY (ck1 ASC, ck2 DESC);
"""

UDT = """
CREATE TYPE ks.address (street text, city text, zip int);
CREATE TABLE ks.people (
  id uuid PRIMARY KEY,
  tags set<text>,
  scores list<frozen<tuple<int, double>>>,
  attrs map<text, frozen<address>>,
  addr frozen<address>
);
"""


def test_basic_table():
    t = parse_create_table(BASIC)
    assert t.keyspace == "ks" and t.name == "basic_test"
    assert [c.name for c in t.partition_keys] == ["a"]
    assert [c.name for c in t.clustering_keys] == []
    kinds = {c.name: c.kind for c in t.columns}
    assert kinds == {"a": "partition_key", "b": "regular", "c": "regular"}


def test_compound_keys_and_order():
    t = parse_create_table(COMPOUND)
    assert [c.name for c in t.partition_keys] == ["pk1", "pk2"]
    assert [c.name for c in t.clustering_keys] == ["ck1", "ck2"]
    orders = {c.name: c.order for c in t.clustering_keys}
    assert orders == {"ck1": "ASC", "ck2": "DESC"}
    assert [c.name for c in t.static_columns] == ["s"]


def test_struct_type_roles_and_metadata():
    st = schema_for_ddl(COMPOUND)
    f = {x.name: x for x in st.fields}
    assert f["pk1"].metadata["kind"] == "partition_key"
    assert f["pk1"].nullable is False
    assert f["ck2"].metadata["order"] == "DESC"
    assert f["s"].metadata["kind"] == "static"
    assert isinstance(f["val"].dataType, T.DoubleType)
    assert isinstance(f["ck1"].dataType, T.TimestampType)


def test_udt_tuple_collections():
    st = schema_for_ddl(UDT)
    f = {x.name: x for x in st.fields}
    assert isinstance(f["id"].dataType, T.StringType)  # uuid → string
    assert f["tags"].dataType == T.ArrayType(T.StringType())  # set → array
    scores = f["scores"].dataType
    assert isinstance(scores, T.ArrayType)
    tup = scores.elementType
    assert isinstance(tup, T.StructType)
    assert [x.name for x in tup.fields] == ["0", "1"]  # tuple fields "0","1"
    attrs = f["attrs"].dataType
    assert isinstance(attrs, T.MapType)
    assert isinstance(attrs.valueType, T.StructType)
    addr = f["addr"].dataType
    assert [x.name for x in addr.fields] == ["street", "city", "zip"]
    assert isinstance(addr["zip"].dataType, T.IntegerType)


def test_type_mapping_table():
    cases = {
        "ascii": T.StringType(),
        "bigint": T.LongType(),
        "time": T.LongType(),
        "timestamp": T.TimestampType(),
        "smallint": T.ShortType(),
        "tinyint": T.ByteType(),
        "blob": T.BinaryType(),
        "inet": T.BinaryType(),
        "date": T.DateType(),
        "timeuuid": T.StringType(),
        "decimal": T.DecimalType(38, 19),
        "varint": T.DecimalType(38, 0),
    }
    for cql, expected in cases.items():
        assert parse_cql_type(cql) == expected, cql


def test_counter_and_duration_rejected():
    with pytest.raises(UnsupportedCqlType):
        parse_cql_type("counter")
    with pytest.raises(UnsupportedCqlType):
        parse_cql_type("duration")
    with pytest.raises(UnsupportedCqlType):
        schema_for_ddl("CREATE TABLE ks.t (id int PRIMARY KEY, d duration);")


def test_quoted_identifiers_case_preserving():
    ddl = '''CREATE TABLE "QuotedKs"."QuotedTbl" ("Id" int PRIMARY KEY, "Value" text, "select" int);'''
    t = parse_create_table(ddl)
    assert t.keyspace == "QuotedKs" and t.name == "QuotedTbl"
    names = [c.name for c in t.columns]
    assert names == ["Id", "Value", "select"]
    assert t.partition_keys[0].name == "Id"


def test_nested_map_of_list():
    dt = parse_cql_type("map<text, frozen<list<int>>>")
    assert dt == T.MapType(T.StringType(), T.ArrayType(T.IntegerType()))


def test_big_number_config_sizes_decimals():
    """BigNumberConfig.java parity: decimal/varint precision+scale are a
    per-read knob, not constants."""
    import pytest
    from pyspark.sql import types as T

    from cassandra_analytics_spark.schema import (
        BigNumberConfig,
        parse_cql_type,
        schema_for_ddl,
    )

    assert parse_cql_type("decimal") == T.DecimalType(38, 19)
    assert parse_cql_type("varint") == T.DecimalType(38, 0)
    cfg = BigNumberConfig(
        big_decimal_precision=20,
        big_decimal_scale=4,
        big_integer_precision=30,
        big_integer_scale=0,
    )
    assert parse_cql_type("decimal", big_numbers=cfg) == T.DecimalType(20, 4)
    assert parse_cql_type("varint", big_numbers=cfg) == T.DecimalType(30, 0)
    # nested positions honor the knob too (list<frozen<decimal>> etc.)
    assert parse_cql_type("list<frozen<decimal>>", big_numbers=cfg) == T.ArrayType(
        T.DecimalType(20, 4)
    )
    ddl = "CREATE TABLE ks.t (pk bigint PRIMARY KEY, d decimal, v varint)"
    st = schema_for_ddl(ddl, big_numbers=cfg)
    assert st["d"].dataType == T.DecimalType(20, 4)
    assert st["v"].dataType == T.DecimalType(30, 0)
    with pytest.raises(ValueError):
        BigNumberConfig(big_decimal_precision=39)
    with pytest.raises(ValueError):
        BigNumberConfig(big_decimal_scale=40)


def test_to_struct_type_accepts_udts():
    """The documented C2 path (CqlTable -> StructType) must handle UDT
    columns when given the definitions — it used to hard-code udts={}
    with a comment claiming they were resolved at parse time (they are
    not; column types stay raw CQL strings)."""
    from cassandra_analytics_spark.schema import (
        parse_create_table,
        parse_udts,
        to_struct_type,
    )

    table = parse_create_table(UDT)
    st = to_struct_type(table, udts=parse_udts(UDT))
    addr = {x.name: x for x in st.fields}["addr"].dataType
    assert [x.name for x in addr.fields] == ["street", "city", "zip"]


def test_primary_key_referencing_undefined_column_rejected():
    """Typo'd DDL (PRIMARY KEY names a non-existent column) must fail at
    parse time like Cassandra, not produce a table with an empty
    partition-key list (round-7 hostile pass)."""
    import pytest

    from cassandra_analytics_spark.schema import parse_create_table

    with pytest.raises(ValueError, match="undefined column"):
        parse_create_table(
            "CREATE TABLE ks.t (id int, v text, PRIMARY KEY (idd))"
        )
    with pytest.raises(ValueError, match="undefined column"):
        parse_create_table(
            "CREATE TABLE ks.t (id int, c int, v text, "
            "PRIMARY KEY ((id), cc))"
        )


def test_malformed_type_expressions_fail_as_value_errors():
    """Truncated / empty type expressions must raise a malformed-type
    ValueError, not IndexError from running off the token list (round-8
    continuation probe)."""
    from cassandra_analytics_spark.schema import parse_cql_type

    for bad in ("list<int", "", "frozen<", "map<int", "tuple<int,"):
        with pytest.raises(ValueError, match="unexpected end|expected"):
            parse_cql_type(bad)


def test_recursive_udt_rejected():
    """A UDT referencing itself (directly or via another UDT) has no
    finite StructType; Cassandra rejects such DDL. Fail with a clear
    ValueError instead of RecursionError (round-8 continuation probe)."""
    from cassandra_analytics_spark.schema import parse_cql_type

    with pytest.raises(ValueError, match="recursive UDT"):
        parse_cql_type("t", {"t": {"f": "frozen<t>"}})
    with pytest.raises(ValueError, match="recursive UDT"):
        parse_cql_type("a", {"a": {"f": "b"}, "b": {"g": "frozen<list<a>>"}})
    # DIAMOND references (one UDT used twice, no cycle) must still parse
    sibling = parse_cql_type(
        "top", {"top": {"l": "leaf", "r": "leaf"}, "leaf": {"x": "int"}}
    )
    assert [f.name for f in sibling.fields] == ["l", "r"]


def test_duplicate_columns_and_keys_rejected():
    """Cassandra parse-time rejections the old code silently accepted:
    duplicate column names produced a StructType with two same-named
    fields; a column in both the partition-key and clustering lists had
    its kind overwritten, leaving partition_keys EMPTY; a second PRIMARY
    KEY definition silently won (round-8 continuation probe)."""
    from cassandra_analytics_spark.schema import parse_create_table

    with pytest.raises(ValueError, match="duplicate column"):
        parse_create_table("CREATE TABLE ks.t (a int, a text, PRIMARY KEY (a))")
    with pytest.raises(ValueError, match="more than once in PRIMARY KEY"):
        parse_create_table(
            "CREATE TABLE ks.t (a int, b int, PRIMARY KEY ((a), a))"
        )
    with pytest.raises(ValueError, match="multiple PRIMARY KEY"):
        parse_create_table(
            "CREATE TABLE ks.t (a int, b int, PRIMARY KEY (a), PRIMARY KEY (b))"
        )
    with pytest.raises(ValueError, match="multiple PRIMARY KEY"):
        parse_create_table(
            "CREATE TABLE ks.t (a int PRIMARY KEY, b int, PRIMARY KEY (b))"
        )


def test_unterminated_create_table_rejected():
    """Truncated DDL must fail with a message naming the problem, not the
    old 'substring not found' from deep inside the PRIMARY KEY clause
    parse (round-8 continuation probe)."""
    from cassandra_analytics_spark.schema import parse_create_table

    with pytest.raises(ValueError, match="unterminated CREATE TABLE"):
        parse_create_table("CREATE TABLE ks.t (a int, PRIMARY KEY (a)")
