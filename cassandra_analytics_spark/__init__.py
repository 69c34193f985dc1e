"""cassandra_analytics_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``apache/cassandra-analytics`` (the Cassandra Spark Bulk Reader / Bulk Writer):

* a **source layer** with the reference's read semantics — last-write-wins
  compaction merge, tombstone/TTL purge, static-column propagation,
  partition-key filter pushdown, token-range partition planning
  (reference: ``cassandra-analytics-core/.../sparksql/CassandraDataSource.java``)
* a **sink layer** with the reference's bulk-write semantics — schema
  validation, token hashing, range-partition + sort, sized sorted file
  output with per-file digests and an atomic two-phase commit
  (reference: ``cassandra-analytics-core/.../sparksql/CassandraDataSink.java``)
* the full **relational operator surface** the reference delegates to
  Spark SQL, exposed natively over parquet tables, plus the
  LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join planning; custom semantics are library functions composing built-in
operators, never row-at-a-time Python loops.
"""

from cassandra_analytics_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["Engine", "get_session", "__version__"]


def __getattr__(name):
    if name == "Engine":  # lazy: avoid importing pyspark machinery eagerly
        from cassandra_analytics_spark.api import Engine

        return Engine
    raise AttributeError(name)
