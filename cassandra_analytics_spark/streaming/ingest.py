"""Streaming ingestion into the engine's bulk-table format.

``writeStream.foreachBatch`` → :func:`bulk_write`: every micro-batch
becomes one committed, token-sorted, digest-manifested batch directory,
and the read side's LWW compaction merge reconciles whatever the stream
delivered (duplicates, out-of-order updates) — the streaming twin of the
reference's append-only SSTable import model.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame

from cassandra_analytics_spark.sinks.bulk_writer import bulk_write


def stream_bulk_ingest(
    stream: DataFrame,
    table_path: str,
    partition_keys: Sequence[str],
    clustering_keys: Sequence[str] = (),
    writetime_col: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "bulk_ingest",
):
    """Start a streaming query that lands every micro-batch as one
    committed batch of the bulk table. ``writetime_col`` (micros since
    epoch, long) stamps LWW order from event time; defaults to the commit
    wall-clock."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        df = batch_df
        if writetime_col is not None:
            # per-row writetime: bulk_write keeps a caller-supplied
            # `writetime` column (TimestampOption per-row mode)
            from pyspark.sql import functions as F

            df = batch_df.withColumn("writetime", F.col(writetime_col).cast("long"))
        bulk_write(df, table_path, partition_keys, clustering_keys)

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ingest-ckpt-")
    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint, query_name))
        .start()
    )
