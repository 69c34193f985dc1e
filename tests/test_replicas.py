"""M3 replica-selection / consistency emulation."""

from __future__ import annotations

import pytest

from cassandra_analytics_spark.operators.merge import latest_by_key
from cassandra_analytics_spark.operators.replicas import (
    block_for,
    read_with_consistency,
    select_replicas,
)

MV_SCHEMA = (
    "pk string, ck int, val string, writetime long, ttl int, "
    "tombstone string, replica_id int"
)


def _replicated(spark, rows_per_key=1, rf=3, divergent=False):
    rows = []
    for k in range(200):
        for r in range(1, rf + 1):
            # divergent: replica 1 missed the latest write
            wt = 100 if (divergent and r == 1) else 200
            val = "stale" if (divergent and r == 1) else "fresh"
            rows.append((f"k{k}", 0, val, wt, None, None, r))
    return spark.createDataFrame(rows, MV_SCHEMA)


def test_block_for_math():
    assert block_for("ONE", 3) == 1
    assert block_for("QUORUM", 3) == 2
    assert block_for("LOCAL_QUORUM", 5) == 3
    assert block_for("ALL", 3) == 3
    with pytest.raises(ValueError):
        block_for("ANY", 3)


def test_select_replicas_counts(spark):
    df = _replicated(spark)
    one = select_replicas(df, ["pk"], "ONE", rf=3)
    quorum = select_replicas(df, ["pk"], "QUORUM", rf=3)
    allr = select_replicas(df, ["pk"], "ALL", rf=3)
    assert one.count() == 200  # exactly one replica's copy per key
    assert quorum.count() == 400
    assert allr.count() == 600
    # every key still present at CL=ONE
    assert one.select("pk").distinct().count() == 200


def test_quorum_read_heals_divergence(spark):
    # replica 1 is stale; quorum (2 of 3) always includes a fresh replica
    df = _replicated(spark, divergent=True)
    merged = read_with_consistency(df, ["pk"], ["ck"], "QUORUM", rf=3)
    vals = {r.val for r in merged.collect()}
    assert vals == {"fresh"}
    assert merged.count() == 200


def test_consistency_result_matches_full_merge_when_in_sync(spark):
    df = _replicated(spark)
    for cl in ("ONE", "QUORUM", "ALL"):
        merged = read_with_consistency(df, ["pk"], ["ck"], cl, rf=3)
        got = {(r.pk, r.ck, r.val) for r in merged.collect()}
        want = {
            (r.pk, r.ck, r.val)
            for r in latest_by_key(
                df.drop("replica_id", "ttl", "tombstone"), ["pk", "ck"], "writetime"
            ).collect()
        }
        assert got == want, cl


# ---------------------------------------------------------------------------
# Repair-primary selection (PartitionedDataLayer.java:434-495,
# SingleReplica.isRepairPrimary): repaired SSTables stream from ONE
# designated replica per range; unrepaired from blockFor-many.
# ---------------------------------------------------------------------------

MVR_SCHEMA = (
    "pk string, ck int, val string, writetime long, ttl int, "
    "tombstone string, replica_id int, repaired boolean"
)


def _repaired_fixture(spark, rf=3):
    rows = []
    for k in range(100):
        for r in range(1, rf + 1):
            # one repaired row (identical on every replica) and one
            # unrepaired row whose replica 2 copy carries a newer write
            rows.append((f"k{k}", 0, "repaired-val", 100, None, None, r, True))
            wt = 300 if r == 2 else 200
            val = "unrep-new" if r == 2 else "unrep-old"
            rows.append((f"k{k}", 1, val, wt, None, None, r, False))
    return spark.createDataFrame(rows, MVR_SCHEMA)


def test_repair_primary_reads_repaired_once(spark):
    from cassandra_analytics_spark.operators.replicas import (
        select_replicas_repair_aware,
    )

    df = _repaired_fixture(spark)
    sel = select_replicas_repair_aware(df, ["pk"], "QUORUM", rf=3)
    rep = sel.filter("repaired")
    unrep = sel.filter("NOT repaired")
    # repaired rows: exactly ONE replica's copy per key (the primary);
    # unrepaired rows: blockFor(QUORUM, 3) = 2 copies per key
    assert rep.count() == 100
    assert rep.select("pk").distinct().count() == 100
    assert unrep.count() == 200
    # the split changes which rows participate vs plain selection
    plain = select_replicas(df, ["pk"], "QUORUM", rf=3)
    assert plain.filter("repaired").count() == 200


def test_repair_aware_read_merges_unrepaired_divergence(spark):
    df = _repaired_fixture(spark)
    out = read_with_consistency(
        df, ["pk"], ["ck"], consistency="ALL", rf=3, repaired_col="repaired"
    )
    got = {(r.pk, r.ck): r.val for r in out.collect()}
    for k in range(100):
        assert got[(f"k{k}", 0)] == "repaired-val"
        # CL=ALL reads every unrepaired replica → newest write wins
        assert got[(f"k{k}", 1)] == "unrep-new"


def test_repair_aware_read_one_may_miss_unrepaired_divergence(spark):
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.operators.replicas import (
        select_replicas_repair_aware,
    )

    df = _repaired_fixture(spark)
    # At CL=ONE only the primary's unrepaired copy participates: for keys
    # whose primary is NOT replica 2, the newer write on replica 2 is
    # invisible — exactly Cassandra's CL=ONE staleness.
    sel = select_replicas_repair_aware(df, ["pk"], "ONE", rf=3)
    vals = {r.val for r in sel.filter("NOT repaired").collect()}
    assert "unrep-old" in vals  # some keys read a stale copy


def test_missing_repaired_col_raises(spark):
    """Round-8 hostile pass: a typo'd repaired_col used to silently fall
    back to plain CL selection — repaired data read CL-many times with
    no signal the semantics changed."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, "x", 100, None, None, 1)],
        "pk string, ck int, val string, writetime long, ttl int, "
        "tombstone string, replica_id int",
    )
    with pytest.raises(ValueError, match="repaired_col"):
        read_with_consistency(
            df, ["pk"], ["ck"], "ALL", rf=3, repaired_col="repared"  # typo
        )


def test_block_for_validates_impossible_configs():
    """Round-10 probe: rf < 1 used to surface as an ANSI pmod-by-zero
    deep in the job; blockFor > rf silently selected every replica,
    quietly weakening the requested guarantee."""
    import pytest

    from cassandra_analytics_spark.operators.replicas import block_for

    with pytest.raises(ValueError, match="rf must be >= 1"):
        block_for("ONE", 0)
    with pytest.raises(ValueError, match="impossible configuration"):
        block_for("TWO", 1)
    with pytest.raises(ValueError, match="impossible configuration"):
        block_for("THREE", 2)
    assert block_for("QUORUM", 3) == 2
    assert block_for("ALL", 1) == 1
