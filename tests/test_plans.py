"""Physical-plan assertions: the optimizations SURVEY §4 promises must
actually appear in the executed plans — pushdown, pruning, broadcast
joins, TakeOrderedAndProject — so regressions are caught, not guessed."""

from __future__ import annotations

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # only the 7 needed columns of 11 reach the scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_in_list_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pk_in_list_pushdown")
    assert "In(l_orderkey" in plan  # F1 EqualTo/In analog pushed to parquet


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    # formatted mode lists each node in the tree and in the details section
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_topk_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_global_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort stage


def test_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # map-side partial agg then final: two HashAggregate around one Exchange
    assert plan.count("HashAggregate") >= 2


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    import contextlib
    import io

    from cassandra_analytics_spark.queries import REGISTRY

    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # trigger execution so AQE finalizes the plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan  # runtime partition coalescing active
