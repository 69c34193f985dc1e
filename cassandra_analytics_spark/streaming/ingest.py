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
            # `writetime` column (TimestampOption per-row mode). The
            # engine convention is MICROS since epoch — a timestamp
            # column must go through unix_micros (cast('long') on a
            # timestamp yields SECONDS, which would lose every LWW race
            # against wall-clock-stamped batches by six orders of
            # magnitude).
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            src_type = batch_df.schema[writetime_col].dataType
            if isinstance(src_type, T.TimestampType):
                wt = F.unix_micros(F.col(writetime_col))
            elif isinstance(src_type, T.TimestampNTZType):
                # ntz → ltz under the session tz (UTC per engine contract)
                wt = F.unix_micros(F.col(writetime_col).cast("timestamp"))
            elif isinstance(src_type, (T.LongType, T.IntegerType)):
                wt = F.col(writetime_col).cast("long")
            else:
                raise TypeError(
                    f"writetime_col {writetime_col!r} has type {src_type}; "
                    "expected a timestamp or micros-since-epoch long"
                )
            df = batch_df.withColumn("writetime", wt)
        bulk_write(df, table_path, partition_keys, clustering_keys)

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ingest-ckpt-")
    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint, query_name))
        .start()
    )
