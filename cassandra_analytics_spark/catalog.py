"""Table catalog over the driver's parquet fixtures.

The reference obtains its table from a live cluster (Sidecar `schema()` →
CQL DDL → StructType, ``CassandraDataLayer.java:271,286``); here the
catalog's job is to expose the test parquet tables as named DataFrames /
temp views so every operator and query addresses tables by name, exactly
like the reference's ``keyspace.table`` addressing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so Catalyst
    gets full pushdown/pruning (SURVEY §2.1 P1/F1 analogs are free).

    Source-layer type normalization (the analog of the reference's CQL→Spark
    converters, SURVEY §1.3): parquet TIMESTAMP(NANOS) columns arrive as
    longs under ``nanosAsLong`` and are truncated to microsecond timestamps
    — the same floor-truncation DuckDB applies when casting TIMESTAMP_NS.

    The resolved DataFrame is memoized per (session, path, file mtime) —
    catalog METADATA caching, the same thing ``spark.table`` over a
    metastore or the file-source listing cache gives for free (guide §6).
    Without it every query rebuild re-lists the path and re-reads the
    parquet footer schema (~150 ms per table per call, measured r16 —
    ~40% of the bench's per-query wall was this driver-side rebuild).
    Execution is untouched: the DataFrame is lazy and every action still
    scans the parquet files; the mtime key drops the entry the moment a
    fixture is regenerated."""
    path = table_path(sf_dir, name)
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    cache: dict = spark.__dict__.setdefault("_graft_table_cache", {})
    key = (os.path.abspath(path), mtime)
    if mtime is not None and key in cache:
        return cache[key]

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Defensive runtime confs: the caller may hand us a session that was
    # not built by our factory (e.g. the round driver's). Both are
    # runtime-settable SQL confs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    df = spark.read.parquet(path)
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # FLOOR division nanos→micros: `ts div 1000` truncates toward
            # zero, which rounds PRE-epoch timestamps the wrong way
            # (-1500 ns must floor to -2 µs, not -1) — subtracting the
            # nonnegative pmod remainder makes the div exact, staying in
            # long math (double division loses exactness past 2^53 ns ≈
            # 104 days). Post-epoch values are unchanged (round-8 pass).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet TIMESTAMP without UTC adjustment → NTZ; normalize to
            # TIMESTAMP (session tz is UTC above, so values are unchanged)
            # so event-time functions (unix_micros, watermarks) resolve.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if mtime is not None:
        cache[key] = df
    return df


# Rows-per-task floor for spread_scan (r17, measured): a round-robin
# exchange only pays for itself when every resulting task still holds
# at least this many rows of genuinely scan-dominated work. Interleaved
# A/B at 1x/4x/16x the sf0.1 corpus (scripts/spread_floor_ab.py): the
# single-pass scan shapes (token stats) win 1.7-1.8x at 20k/80k rows
# with the repartition sized to rows//2500 (20k->8 beats 20k->32), and
# LOSE at 5k rows — exactly the driver-measured r16 regressions.
SPREAD_MIN_ROWS_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_ROWS_PER_TASK", "2500")
)
# below this many tasks the exchange's fixed cost (extra stage,
# sort-before-repartition) outweighs the width it buys (measured: the
# 5k-row corpus sized to 2 tasks still regressed)
_SPREAD_MIN_WIDTH = 4


def _scan_meta(spark: SparkSession, path: str, mtime) -> tuple[int, int]:
    """(num_rows, record-bearing splits) from the parquet FOOTER —
    driver-side metadata only, memoized per (path, mtime). Spark's
    byte-range splits beyond a row-group start read zero records
    (r16: verified on the single-row-group fixtures), so the number of
    row groups IS the scan's achievable parallelism; reading it from
    the footer replaces the r16 ``df.rdd.getNumPartitions()`` probe
    (a driver-side RDD conversion per table — VERDICT r16 item 4)."""
    cache: dict = spark.__dict__.setdefault("_graft_table_cache", {})
    key = ("scan_meta", os.path.abspath(path), mtime)
    meta = cache.get(key)
    if meta is None:
        import pyarrow.parquet as pq

        try:
            if os.path.isdir(path):
                rows = groups = 0
                for entry in os.scandir(path):
                    if entry.name.endswith(".parquet"):
                        md = pq.ParquetFile(entry.path).metadata
                        rows += md.num_rows
                        groups += md.num_row_groups
            else:
                md = pq.ParquetFile(path).metadata
                rows, groups = md.num_rows, md.num_row_groups
        except Exception:
            # unreadable footer: report "already parallel" so the
            # caller never adds an exchange on unknown layouts
            rows, groups = 0, 1 << 30
        meta = (rows, max(groups, 1))
        cache[key] = meta
    return meta


def spread_scan(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: tuple[str, ...] | None = None,
    min_rows_per_task: int | None = None,
) -> DataFrame:
    """:func:`load_table`, re-spread across the cluster when the file
    layout cannot provide scan parallelism on its own AND the scan-side
    work is large enough to pay for the exchange.

    The fixture tables are single-file, SINGLE-ROW-GROUP parquet, so a
    scan stage is one task no matter how `maxPartitionBytes` /
    `minPartitionNum` split the byte range. Guide §2.5's "one huge
    unsplittable file → repartition immediately after the read", applied
    with a COST GATE (r17, VERDICT r16 item 1 — the unconditional r16
    form regressed 5 driver-measured queries at sf0.1):

    * spread only when the footer row count clears
      ``min_rows_per_task`` per resulting task AND the result is at
      least ``_SPREAD_MIN_WIDTH`` tasks wide;
    * size the repartition to ``min(defaultParallelism,
      rows // min_rows_per_task)`` — the measured optimum at 4x bench
      scale was 8 tasks, not the blanket 32;
    * project to ``columns`` BEFORE the exchange so the repartition
      never defeats column pruning (the r16 form shipped full rows —
      ngram's input_bytes +17%);
    * self-disable on any layout that can already feed the cluster
      (row groups * 2 > parallelism) — the 100 TB posture, unchanged.
    """
    df = load_table(spark, sf_dir, name)
    path = table_path(sf_dir, name)
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    floor = (
        SPREAD_MIN_ROWS_PER_TASK
        if min_rows_per_task is None
        else min_rows_per_task
    )
    cache: dict = spark.__dict__.setdefault("_graft_table_cache", {})
    key = ("spread", os.path.abspath(path), mtime, columns, floor)
    spread = cache.get(key)
    if spread is None:
        par = spark.sparkContext.defaultParallelism
        rows, n_splits = _scan_meta(spark, path, mtime)
        if n_splits * 2 > par:
            spread = df  # layout already feeds the cluster (100 TB case)
        else:
            n_target = min(par, rows // max(floor, 1))
            if n_target <= n_splits or n_target < _SPREAD_MIN_WIDTH:
                spread = df  # too little work to pay an exchange (r17)
            else:
                proj = df.select(*columns) if columns else df
                spread = proj.repartition(int(n_target))
        cache[key] = spread
    return spread


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES if
            os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
