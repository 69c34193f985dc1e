"""Bucketed tables: shuffle-free co-located joins at scale.

The reference co-locates by token ranges (its ring IS a bucketing scheme);
the Spark-native equivalent is ``bucketBy``: both join sides pre-hashed
into the same number of buckets on the join key mean the sort-merge join
reads matching buckets directly — **no Exchange on either side**. For a
100 TB fact table that is the difference between joining in place and
reshuffling the dataset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planner elides both
    shuffles when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
