"""Partition-size analytics — the reference's S3 operator.

The reference reads ONLY Index.db (+CompressionInfo) to produce a
per-Cassandra-partition on-disk size table: partition keys + ``uncompressed``
+ ``compressed`` longs (reference:
``cassandra-analytics-core/.../sparksql/PartitionSizeTableProvider.java:46-59``,
``PartitionSizeIterator.java:39-84``, ``four-zero-bridge/.../IndexReader.java:185-220``).

Over columnar fixtures the analog is a metadata-style aggregation: estimate
each row's serialized byte size from its column values, sum per partition
key, and model compression with a constant ratio. A single groupBy —
map-side partial aggregation makes this near-free at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Modeled compression ratio for the `compressed` column (LZ4-ish).
COMPRESSION_RATIO = 0.6

_FIXED_SIZES = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.DateType: 4,
    T.FloatType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
}


def row_size_bytes(df: DataFrame, cols: Sequence[str] | None = None) -> Column:
    """Estimated serialized size of a row: fixed widths for numeric /
    temporal types, ``octet_length`` for strings/binary, element-wise for
    arrays. Mirrors how the reference sizes partitions from index offsets —
    a deterministic per-row byte count."""
    if cols is not None:
        # a misspelled column used to be silently skipped — every row
        # sized 0 with no error (round-8 continuation probe)
        unknown = set(cols) - {f.name for f in df.schema.fields}
        if unknown:
            raise ValueError(
                f"row_size_bytes: columns not in the DataFrame: "
                f"{sorted(unknown)} (have: {df.columns})"
            )
    total: Column = F.lit(0).cast("long")
    for field in df.schema.fields:
        if cols is not None and field.name not in cols:
            continue
        c = F.col(field.name)
        dtype = type(field.dataType)
        if dtype in _FIXED_SIZES:
            size = F.when(c.isNull(), 0).otherwise(_FIXED_SIZES[dtype])
        elif dtype in (T.StringType, T.BinaryType):
            size = F.coalesce(F.octet_length(c), F.lit(0))
        elif dtype is T.DecimalType:
            size = F.when(c.isNull(), 0).otherwise(16)
        elif dtype is T.ArrayType and type(field.dataType.elementType) in _FIXED_SIZES:
            size = F.coalesce(
                F.size(c) * _FIXED_SIZES[type(field.dataType.elementType)], F.lit(0)
            )
        else:
            # complex nested type: serialize to json as an upper-bound proxy
            size = F.coalesce(F.octet_length(F.to_json(c)), F.lit(0))
        total = total + size.cast("long")
    return total


def partition_sizes(
    df: DataFrame,
    partition_keys: Sequence[str],
    compression_ratio: float = COMPRESSION_RATIO,
) -> DataFrame:
    """Per-partition size stats: (pk..., uncompressed, compressed, row_count).

    Matches the reference's output schema
    (``DataLayer.partitionSizeStructType``, ``DataLayer.java:72-88``) plus a
    row_count column. groupBy → partial agg map-side, single shuffle."""
    if not partition_keys:
        # groupBy() of an empty key list silently produced ONE keyless
        # global row — not a per-partition size table (round-8 probe)
        raise ValueError("partition_sizes needs at least one partition key")
    if not compression_ratio > 0:
        # a non-positive ratio silently emitted negative/zero compressed
        # sizes (round-8 probe)
        raise ValueError(
            f"compression_ratio must be > 0, got {compression_ratio}"
        )
    sized = df.withColumn("__sz", row_size_bytes(df))
    return sized.groupBy(*partition_keys).agg(
        F.sum("__sz").alias("uncompressed"),
        F.floor(F.sum("__sz") * F.lit(compression_ratio)).cast("long").alias("compressed"),
        F.count(F.lit(1)).alias("row_count"),
    )
