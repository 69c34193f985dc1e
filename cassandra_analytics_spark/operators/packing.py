"""Sequence packing: lay documents into fixed-size training chunks.

Pretraining pipelines concatenate the tokenized corpus in a deterministic
order and split it every ``budget`` tokens; each document therefore spans
one or more chunks, and each chunk holds slices of one or more documents
(the GPT-style "packed" layout). The core primitive is a **global prefix
sum** of document lengths — and a naive Spark global window
(``Window.orderBy(...)`` with no partition) collapses the whole corpus
into ONE task, the canonical 100 TB scale-killer.

:func:`distributed_cumsum` does it properly in two phases, the classic
parallel prefix-sum:

1. ``repartitionByRange`` on the order key, cumsum *within* each range
   partition (parallel across partitions),
2. per-partition totals (#partitions rows — bounded, collected) turned
   into per-partition starting offsets and broadcast-joined back.

Two narrow shuffles of the corpus, parallelism = #partitions throughout;
no single-task stage anywhere.

:func:`chunk_layout` then derives each document's chunk span with pure
expressions (floor-division + ``sequence``/``explode``) — closed-form,
no iteration, so a DuckDB oracle can recompute it exactly.

:func:`pack_greedy` is the other packing flavor (whole documents only,
first-fit into the current bin until the budget would overflow, greedy
restart). That rule is inherently sequential, so it runs per range
partition via ``applyInPandas`` — bins never cross partitions, which is
the standard scale trade-off (a bounded amount of per-partition padding
in exchange for full parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order.

    ``out_col`` = sum of ``value_col`` over all rows strictly before this
    one — computed with range partitioning + per-partition offsets, never
    a single-partition global window. The per-partition totals collect is
    O(#partitions), independent of data size.

    ``order_col`` values must be UNIQUE (enforced below): "strictly
    before" is undefined between ties, so duplicate keys cannot have a
    correct exclusive prefix sum — and the window would otherwise fall
    back to a RANGE frame that silently gives every tie the SAME sum,
    producing overlapping spans in :func:`chunk_layout`. Callers with a
    non-unique ordering column must compose a unique one first (e.g.
    ``struct(ts, id)`` is not orderable here — concatenate or derive a
    surrogate instead).

    The ranged partitioning is materialized ONCE (eager local checkpoint,
    as in :mod:`..operators.graph`): ``repartitionByRange`` samples its
    split points per job, so running the lineage twice — once for the
    totals collect, once when the caller executes the returned plan —
    could assign rows to different ``__pid`` values and silently corrupt
    the prefix sums. Checkpointing pins one partitioning for both phases
    (and avoids recomputing the upstream lineage a second time).
    """
    from pyspark.sql import types as T

    # integral addends only: the per-partition offsets accumulate on the
    # driver and rejoin as literals, and the result casts to long — a
    # DOUBLE value_col would silently TRUNCATE both (a caller prefix-
    # summing revenue gets wrong sums with no hint; round-10 hostile
    # re-review). Cast to long/decimal first if that is really wanted.
    vtype = df.schema[value_col].dataType
    integral = isinstance(vtype, T.IntegralType) or (
        isinstance(vtype, T.DecimalType) and vtype.scale == 0
    )
    if not integral:
        raise ValueError(
            f"distributed_cumsum: value_col {value_col!r} is "
            f"{vtype.simpleString()} — only integral addends (or scale-0 "
            "decimals) sum exactly; the long offsets would silently "
            "truncate fractional values; cast first"
        )
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # partition-local inclusive cumsum, then make it exclusive (explicit
    # ROWS frame: the orderBy default is a RANGE frame, which sums ties
    # together — with the uniqueness check below both frames agree, but
    # the plan should not depend on that invariant twice)
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__local", F.sum(value_col).over(w) - F.col(value_col)
    )
    # totals + order-key uniqueness in the SAME O(#partitions) collect
    # (range partitioning sends equal keys to one partition, so per-pid
    # distinct counts see every duplicate)
    totals = (
        ranged.groupBy("__pid")
        .agg(
            F.sum(value_col).alias("__total"),
            F.count(F.lit(1)).alias("__n"),
            F.count(order_col).alias("__nn"),  # non-null order keys
            F.countDistinct(order_col).alias("__nd"),
            F.count(value_col).alias("__nv"),  # non-null values
        )
        .orderBy("__pid")
        .collect()
    )
    # distinguish NULLs from ties — countDistinct skips NULLs, so a
    # conflated check would blame "duplicates" the caller can't find
    if any(r["__n"] != r["__nn"] for r in totals):
        raise ValueError(
            f"distributed_cumsum: order_col {order_col!r} contains NULLs — "
            "rows without an ordering key have no position in the prefix sum"
        )
    if any(r["__n"] != r["__nv"] for r in totals):
        # sum() skips NULLs, so a NULL value would poison ONLY its own
        # row's cumsum (NULL out) while silently shifting nothing else —
        # the worst kind of partial corruption; refuse loudly instead
        # (round-8 hostile pass; same O(#partitions) collect, no new job)
        raise ValueError(
            f"distributed_cumsum: value_col {value_col!r} contains NULLs — "
            "a prefix sum over NULL addends is undefined; filter or "
            "coalesce them first"
        )
    if any(r["__nn"] != r["__nd"] for r in totals):
        raise ValueError(
            f"distributed_cumsum: order_col {order_col!r} has duplicate "
            "values — an exclusive prefix sum is undefined between ties; "
            "derive a unique ordering key first"
        )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += int(r["__total"])
    # explicit schema: an EMPTY corpus (or chunk_layout over documents
    # that are all non-positive length) yields zero offsets, and
    # name-only schema inference dies on an empty list — the empty
    # result must flow through with the right columns instead
    # (round-10 hostile re-review)
    from cassandra_analytics_spark.local_data import local_df

    off_df = local_df(spark, offsets, "__pid int, __offset long")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )


def chunk_layout(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    order_col: str | None = None,
) -> DataFrame:
    """One row per (document, chunk) slice of the packed corpus layout.

    Output columns: ``id_col``, ``chunk_id``, ``chunk_offset`` (slice
    start inside the chunk), ``slice_len`` (tokens of this doc in this
    chunk), ``n_chunks`` (chunks this doc spans). Documents with
    non-positive length are dropped (they occupy no tokens).
    """
    order_col = order_col or id_col
    budget = int(budget)
    if budget <= 0:
        raise ValueError(f"chunk_layout: budget must be positive, got {budget}")
    d = df.filter(F.col(len_col) > 0)
    d = distributed_cumsum(d, order_col, len_col, "__end_excl")
    # Offsets are nonnegative longs, so integer `div` == floor division.
    # Plain `/` would be DOUBLE division, which loses exactness past 2^53
    # — the DuckDB oracle uses integer `//`, so stay in long math.
    d = d.select(
        F.col(id_col),
        F.col(len_col),
        F.col("__end_excl").alias("__start"),
        (F.col("__end_excl") + F.col(len_col) - 1).alias("__end"),
    )
    first = F.expr(f"__start div {budget}")
    last = F.expr(f"__end div {budget}")
    spans = d.select(
        F.col(id_col),
        F.col(len_col),
        F.col("__start"),
        F.col("__end"),
        (last - first + 1).cast("int").alias("n_chunks"),
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    slice_start = F.greatest(F.col("__start"), F.col("chunk_id") * budget)
    slice_end = F.least(F.col("__end"), (F.col("chunk_id") + 1) * budget - 1)
    return spans.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (slice_start - F.col("chunk_id") * budget).cast("long").alias("chunk_offset"),
        (slice_end - slice_start + 1).cast("long").alias("slice_len"),
        "n_chunks",
    )


GREEDY_SCHEMA = (
    "doc_id long, bin_id long, bin_fill long"
)


def pack_greedy(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """First-fit greedy packing of WHOLE documents into bins ≤ budget.

    Documents longer than the budget get a bin of their own. Sequential
    by nature → runs inside each range partition (``applyInPandas`` over
    Arrow batches); bin ids are made globally unique as
    ``pid * 2^40 + local_bin``. At 100 TB this wastes at most one
    partially-filled bin per partition — negligible against full
    parallelism for the scan-heavy step.
    """
    import pandas as pd

    from pyspark.sql import types as T

    if int(budget) <= 0:
        raise ValueError(f"pack_greedy: budget must be positive, got {budget}")
    # numeric ids keep the historical cast-to-long output; string ids are
    # carried through UNCAST (lexicographic range partition + sort is just
    # as deterministic) — the dangerous case is only OTHER types, where a
    # silent cast to long would NULL the ids and corrupt the packing
    # order (round-8 pass; string acceptance per the round-8 review)
    id_type = df.schema[id_col].dataType
    if isinstance(id_type, T.NumericType):
        id_expr = F.col(id_col).cast("long").alias("doc_id")
        out_schema = GREEDY_SCHEMA
    elif isinstance(id_type, T.StringType):
        id_expr = F.col(id_col).alias("doc_id")
        out_schema = GREEDY_SCHEMA.replace("doc_id long", "doc_id string")
    else:
        raise ValueError(
            f"pack_greedy: id_col {id_col!r} must be numeric or string "
            f"(got {id_type.simpleString()}) — casting would NULL the "
            "ids; derive a sortable surrogate (e.g. xxhash64) first"
        )

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.filter(F.col(len_col) > 0)
        .select(
            id_expr,
            F.col(len_col).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(n, F.col("doc_id"))
        .withColumn("__pid", F.spark_partition_id())
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        pid = int(pdf["__pid"].iloc[0]) if len(pdf) else 0
        base = pid << 40
        bins, fills, cur, fill = [], [], 0, 0
        for ln in pdf["n_tokens"]:
            ln = int(ln)
            if fill > 0 and fill + ln > budget:
                cur, fill = cur + 1, 0
            bins.append(base + cur)
            fill += ln
            fills.append(fill)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "bin_id": bins, "bin_fill": fills}
        )

    return ranged.groupBy("__pid").applyInPandas(pack, out_schema)
