"""Connected-components correctness: chains, overlapping edges, disjoint
clusters, singletons — the cases the one-pass pair heuristic gets wrong."""

from __future__ import annotations

from cassandra_analytics_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    keep_cluster_representatives,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # path 1-2, 2-3, 3-4: one component rooted at 1 (needs >1 round)
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_overlapping_edges_one_component(spark):
    # (a,c),(b,c): the drop-greater heuristic keeps a AND b; CC must not
    assert _cc(spark, [(1, 3), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_singletons_get_own_cluster(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (9, "w")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
    clustered = {
        r["doc_id"]: r["component"] for r in dedup_clusters(docs, pairs).collect()
    }
    assert clustered == {1: 1, 2: 1, 3: 1, 9: 9}
    reps = sorted(
        r["doc_id"] for r in keep_cluster_representatives(docs, pairs).collect()
    )
    assert reps == [1, 9]


def test_nonconvergence_raises(spark):
    """Hitting max_iter with labels still changing must raise — a
    partially-propagated labeling silently under-merges clusters
    (round-7 hostile pass). A 7-node path needs more than 2 rounds."""
    import pytest

    from cassandra_analytics_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "a BIGINT, b BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and with room to converge the same graph is one component
    comps = connected_components(chain, max_iter=25).collect()
    assert {r.component for r in comps} == {0}


def test_convergence_on_exactly_last_round_is_accepted(spark):
    """/code-review r7: a graph whose final label update lands exactly on
    round max_iter is converged — the certification round (+1) must
    accept it instead of raising."""
    from cassandra_analytics_spark.operators.graph import connected_components

    # a 4-node path needs 3 productive min-label rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(3)], "a BIGINT, b BIGINT"
    )
    comps = connected_components(chain, max_iter=3).collect()
    assert {r.component for r in comps} == {0}

    import pytest

    with pytest.raises(ValueError, match="max_iter"):
        connected_components(chain, max_iter=0)


def test_null_endpoints_register_no_phantom_node(spark):
    """Round-8 probe pass: a NULL edge endpoint produced a (NULL, comp)
    row in the output (crashing downstream sorts). NULL identifies no
    node: the non-NULL side still registers, labels never flow through
    NULL, and no NULL-id row is returned."""
    from cassandra_analytics_spark.operators.graph import (
        connected_components,
        keep_cluster_representatives,
    )

    edges = spark.createDataFrame(
        [(1, None), (None, 2), (3, 4)], "a long, b long"
    )
    labels = sorted(
        (r.id, r.component) for r in connected_components(edges).collect()
    )
    assert labels == [(1, 1), (2, 2), (3, 3), (4, 3)]
    # two half-edges sharing a NULL side must NOT merge through it
    half = spark.createDataFrame([(5, None), (None, 9)], "a long, b long")
    got = sorted(
        (r.id, r.component) for r in connected_components(half).collect()
    )
    assert got == [(5, 5), (9, 9)]
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "doc_id long")
    reps = sorted(
        r.doc_id for r in keep_cluster_representatives(docs, edges).collect()
    )
    assert reps == [1, 2, 3, 9]
