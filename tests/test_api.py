"""Engine facade: the switch-over surface for a reference user."""

from __future__ import annotations

from pyspark.sql import Row

from cassandra_analytics_spark import Engine


def test_engine_lifecycle(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir=sf_dir)
    li = eng.read_table("lineitem")
    assert li.count() > 0

    table = eng.table_from_ddl(
        "CREATE TABLE ks.t (id bigint, ck int, v text, PRIMARY KEY (id, ck));"
    )
    assert [c.name for c in table.partition_keys] == ["id"]

    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(id=1, ck=1, v="a"), Row(id=2, ck=1, v="b")])
    eng.bulk_write(df, path, ["id"], clustering_keys=["ck"], table=table,
                   write_timestamp_micros=1_000)
    eng.delete_partitions(
        spark.createDataFrame([Row(id=1)]), path, ["id"],
        clustering_keys=["ck"], write_timestamp_micros=2_000,
    )
    out = eng.read_bulk_table(path, ["id"], ["ck"])
    assert {r.id for r in out.collect()} == {2}

    views = eng.register_views()
    assert "orders" in views
    assert spark.sql("SELECT count(*) FROM orders").collect()[0][0] > 0
