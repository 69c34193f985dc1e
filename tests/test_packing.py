"""Sequence packing: distributed prefix sum, chunk layout, greedy bins."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.packing import (
    chunk_layout,
    distributed_cumsum,
    pack_greedy,
)


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic mixed lengths incl. one doc longer than the budget
    rows = [Row(doc_id=i, n_tokens=(i * 37) % 900 + 10) for i in range(300)]
    rows.append(Row(doc_id=300, n_tokens=5000))
    return spark.createDataFrame(rows)


def test_distributed_cumsum_matches_sequential(spark, docs):
    got = {
        r.doc_id: r.cumsum
        for r in distributed_cumsum(
            docs, "doc_id", "n_tokens", num_partitions=7
        ).collect()
    }
    acc = 0
    for r in sorted(docs.collect(), key=lambda r: r.doc_id):
        assert got[r.doc_id] == acc
        acc += r.n_tokens


def test_distributed_cumsum_large_partitions_exact(spark):
    # Regression: with more rows per partition than repartitionByRange's
    # per-partition reservoir sample (~100), split points differ between
    # jobs unless the ranged partitioning is materialized once. 40k rows
    # over 8 partitions puts every partition deep into sampled territory;
    # the prefix sum must still be exact.
    rows = [Row(doc_id=i, n_tokens=(i * 131) % 997 + 1) for i in range(40_000)]
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: r.cumsum
        for r in distributed_cumsum(
            df, "doc_id", "n_tokens", num_partitions=8
        ).collect()
    }
    acc = 0
    for i in range(40_000):
        assert got[i] == acc
        acc += (i * 131) % 997 + 1


def test_cumsum_ranged_lineage_is_materialized_once(spark, docs):
    # The returned plan must read a checkpointed RDD, not re-derive the
    # range exchange — that is the structural guarantee that both phases
    # saw one partitioning.
    df = distributed_cumsum(docs, "doc_id", "n_tokens", num_partitions=7)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "RangePartitioning" not in plan


def test_cumsum_has_no_single_partition_window(spark, docs):
    df = distributed_cumsum(docs, "doc_id", "n_tokens", num_partitions=7)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_chunk_layout_exact(spark, docs):
    budget = 1024
    out = chunk_layout(docs, budget, len_col="n_tokens").collect()
    # reconstruct sequentially and compare every slice
    docs_sorted = sorted(docs.collect(), key=lambda r: r.doc_id)
    want = []
    pos = 0
    for r in docs_sorted:
        start, end = pos, pos + r.n_tokens - 1
        for c in range(start // budget, end // budget + 1):
            s = max(start, c * budget)
            e = min(end, (c + 1) * budget - 1)
            want.append((r.doc_id, c, s - c * budget, e - s + 1,
                         end // budget - start // budget + 1))
        pos += r.n_tokens
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_offset, r.slice_len, r.n_chunks)
        for r in out
    )
    assert got == sorted(want)
    # every chunk except the last is exactly full
    per_chunk = {}
    for _, c, _, ln, _ in got:
        per_chunk[c] = per_chunk.get(c, 0) + ln
    last = max(per_chunk)
    assert all(v == budget for c, v in per_chunk.items() if c != last)


def test_pack_greedy_respects_budget(spark, docs):
    budget = 1024
    out = pack_greedy(docs, budget, len_col="n_tokens", num_partitions=5)
    joined = out.join(docs, "doc_id")
    fills = (
        joined.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        # over-budget bins may exist only as single oversized docs
        assert r.total <= budget or r.n == 1
    # every doc assigned exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_pack_greedy_first_fit_semantics(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=t) for i, t in
         enumerate([400, 400, 300, 900, 100, 2000, 50])]
    )
    out = {r.doc_id: r.bin_id for r in
           pack_greedy(df, 1000, num_partitions=1).collect()}
    # docs 0,1 fill bin0 to 800; doc2 (300) overflows -> bin1; doc3 (900)
    # overflows bin1(300) -> bin2; doc4 (100) fits bin2 (1000); doc5
    # (2000, oversized) -> bin3 alone; doc6 -> bin4
    assert out[0] == out[1]
    assert out[2] != out[0] and out[3] != out[2]
    assert out[4] == out[3]
    assert out[5] not in (out[3], out[0], out[2])
    assert out[6] != out[5]


def test_distributed_cumsum_rejects_duplicate_order_keys(spark):
    """An exclusive prefix sum is undefined between ties; the RANGE-frame
    fallback would silently give every tie the same sum (overlapping
    chunk spans). Duplicates must raise."""
    import pytest

    from cassandra_analytics_spark.operators.packing import distributed_cumsum

    df = spark.createDataFrame(
        [(5, 10), (5, 10), (7, 3)], "ord int, n int"
    )
    with pytest.raises(ValueError, match="duplicate"):
        distributed_cumsum(df, "ord", "n").collect()


def test_distributed_cumsum_rejects_null_order_keys_distinctly(spark):
    """NULL order keys are invalid (no position in the prefix sum) and
    must be named as NULLs — not misreported as 'duplicate values'."""
    import pytest

    from cassandra_analytics_spark.operators.packing import distributed_cumsum

    df = spark.createDataFrame(
        [(1, 10), (2, 5), (None, 3)], "ord int, n int"
    )
    with pytest.raises(ValueError, match="NULL"):
        distributed_cumsum(df, "ord", "n").collect()


def test_cumsum_rejects_null_values(spark):
    """Round-8 hostile pass: sum() skips NULL addends, so a NULL value
    would NULL only its own row's cumsum while every later offset stays
    silently unshifted — refuse loudly instead."""
    import pytest

    from cassandra_analytics_spark.operators.packing import distributed_cumsum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "k long, v int"
    )
    with pytest.raises(ValueError, match="contains NULLs"):
        distributed_cumsum(df, "k", "v").collect()


def test_packing_validates_budget_and_id_type(spark):
    import pytest

    from cassandra_analytics_spark.operators.packing import (
        chunk_layout,
        pack_greedy,
    )

    num = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget must be positive"):
        chunk_layout(num, 0)
    with pytest.raises(ValueError, match="budget must be positive"):
        pack_greedy(num, -5)
    # only types that would NULL under a cast are rejected (round-8
    # review: string ids are valid — kept uncast, ordered lexicographically)
    arr = spark.createDataFrame(
        [([1], 10)], "doc_id array<long>, n_tokens long"
    )
    with pytest.raises(ValueError, match="numeric or string"):
        pack_greedy(arr, 100)


def test_pack_greedy_string_ids(spark):
    """String ids pack identically to their numeric twins when the
    lexicographic order matches the numeric order, and doc_id survives
    uncast (round-8 review: the numeric-only guard rejected digit
    strings that previously worked)."""
    from cassandra_analytics_spark.operators.packing import pack_greedy

    rows = [(f"{i:04d}", 40) for i in range(20)]
    strs = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    nums = spark.createDataFrame(
        [(int(i), n) for i, n in rows], "doc_id long, n_tokens long"
    )
    s = {r.doc_id: (r.bin_id, r.bin_fill)
         for r in pack_greedy(strs, 100, num_partitions=1).collect()}
    n = {f"{r.doc_id:04d}": (r.bin_id, r.bin_fill)
         for r in pack_greedy(nums, 100, num_partitions=1).collect()}
    assert s == n and len(s) == 20
    # non-numeric strings order deterministically instead of NULLing out
    words = spark.createDataFrame(
        [("b", 60), ("a", 60), ("c", 60)], "doc_id string, n_tokens long"
    )
    out = sorted(
        pack_greedy(words, 100, num_partitions=1).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in out] == ["a", "b", "c"]
    assert [r.bin_id for r in out] == [0, 1, 2]  # first-fit in id order


def test_cumsum_empty_input_and_fractional_values(spark):
    """Round-10 hostile re-review: an EMPTY input (chunk_layout over
    all-non-positive docs) used to die in schema inference on the empty
    offsets frame; a DOUBLE value_col used to silently TRUNCATE the
    per-partition offsets and the long output — refused loudly now."""
    import pytest

    from cassandra_analytics_spark.operators.packing import (
        chunk_layout,
        distributed_cumsum,
    )

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = distributed_cumsum(empty, "doc_id", "n_tokens")
    assert out.count() == 0
    assert "cumsum" in out.columns

    all_dropped = spark.createDataFrame(
        [(1, 0), (2, -3)], "doc_id long, n_tokens long"
    )
    assert chunk_layout(all_dropped, budget=10).count() == 0

    frac = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "doc_id long, amount double"
    )
    with pytest.raises(ValueError, match="only integral"):
        distributed_cumsum(frac, "doc_id", "amount")
    # fractional-scale decimals truncate the same way: refused too
    with pytest.raises(ValueError, match="only integral"):
        distributed_cumsum(
            frac.select(
                "doc_id", F.col("amount").cast("decimal(10,2)").alias("amount")
            ),
            "doc_id", "amount",
        )

    # scale-0 decimal addends are exact and allowed
    dec = spark.createDataFrame(
        [(1, 3), (2, 4)], "doc_id long, amount long"
    ).select("doc_id", F.col("amount").cast("decimal(10,0)").alias("amount"))
    got = {
        (r.doc_id, r.cumsum)
        for r in distributed_cumsum(dec, "doc_id", "amount").collect()
    }
    assert got == {(1, 0), (2, 3)}
