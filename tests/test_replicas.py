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
        block_for("EVENTUAL", 3)  # not a Cassandra consistency level


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


# ---------------------------------------------------------------------------
# Multi-DC consistency (round 11): per-DC ReplicationFactor math mirroring
# ConsistencyLevel.java:26-123 for NetworkTopologyStrategy — EACH_QUORUM is a
# quorum in EVERY DC, LOCAL_* are defined against the local DC only.
# ---------------------------------------------------------------------------

MDC_SCHEMA = (
    "pk string, ck int, val string, writetime long, ttl int, "
    "tombstone string, replica_id int, dc string"
)

RF_MAP = {"dc1": 3, "dc2": 2}


def _two_dc(spark, keys=120, dc2_newer=False):
    """RF dc1=3, dc2=2; replica ids 1-based within each DC. When
    ``dc2_newer``, every dc2 copy carries a newer write (wt 200 vs 100)."""
    rows = []
    for k in range(keys):
        for dc, rf in RF_MAP.items():
            for r in range(1, rf + 1):
                newer = dc2_newer and dc == "dc2"
                rows.append(
                    (
                        f"k{k}", 0,
                        "fresh" if newer else "stale",
                        200 if newer else 100,
                        None, None, r, dc,
                    )
                )
    return spark.createDataFrame(rows, MDC_SCHEMA)


def test_block_for_multi_dc_math():
    from cassandra_analytics_spark.operators.replicas import (
        block_for,
        block_for_per_dc,
    )

    assert block_for("EACH_QUORUM", RF_MAP) == 4  # 2 + 2
    assert block_for("LOCAL_QUORUM", RF_MAP, local_dc="dc1") == 2
    assert block_for("LOCAL_QUORUM", RF_MAP, local_dc="dc2") == 2
    assert block_for("LOCAL_ONE", RF_MAP, local_dc="dc2") == 1
    assert block_for("QUORUM", RF_MAP) == 3  # (5 // 2) + 1
    assert block_for("ALL", RF_MAP) == 5
    assert block_for("TWO", RF_MAP) == 2

    assert block_for_per_dc("EACH_QUORUM", RF_MAP) == {"dc1": 2, "dc2": 2}
    assert block_for_per_dc("LOCAL_QUORUM", RF_MAP, local_dc="dc2") == {
        "dc1": 0, "dc2": 2,
    }
    assert block_for_per_dc("LOCAL_ONE", RF_MAP, local_dc="dc1") == {
        "dc1": 1, "dc2": 0,
    }
    # global levels: local-first fill, then name order (deterministic
    # stand-in for the snitch's proximity sort)
    assert block_for_per_dc("QUORUM", RF_MAP, local_dc="dc2") == {
        "dc1": 1, "dc2": 2,
    }
    assert block_for_per_dc("QUORUM", RF_MAP) == {"dc1": 3, "dc2": 0}
    assert block_for_per_dc("ALL", RF_MAP) == dict(RF_MAP)

    with pytest.raises(ValueError, match="needs local_dc"):
        block_for("LOCAL_QUORUM", RF_MAP)
    with pytest.raises(ValueError, match="not in the rf map"):
        block_for("LOCAL_ONE", RF_MAP, local_dc="dc9")
    with pytest.raises(ValueError, match="rf map is empty"):
        block_for("ONE", {})
    with pytest.raises(ValueError, match="rf must be >= 1 in every DC"):
        block_for("ONE", {"dc1": 0})
    with pytest.raises(ValueError, match="impossible configuration"):
        block_for("THREE", {"dc1": 1, "dc2": 1})


def test_multi_dc_selection_counts(spark):
    df = _two_dc(spark)
    cases = {
        ("EACH_QUORUM", None): {"dc1": 2, "dc2": 2},
        ("LOCAL_QUORUM", "dc1"): {"dc1": 2, "dc2": 0},
        ("LOCAL_ONE", "dc2"): {"dc1": 0, "dc2": 1},
        ("ALL", None): {"dc1": 3, "dc2": 2},
    }
    for (cl, local), want in cases.items():
        sel = select_replicas(
            df, ["pk"], cl, rf=RF_MAP, dc_col="dc", local_dc=local
        )
        got = {
            r["dc"]: r["n"]
            for r in sel.groupBy("dc").count()
            .withColumnRenamed("count", "n").collect()
        }
        per_key = {dc: n // 120 for dc, n in got.items()}
        assert per_key == {dc: n for dc, n in want.items() if n}, (cl, local)
        # every key survives whenever anything is selected
        assert sel.select("pk").distinct().count() == 120

    # argument pairing is policed both ways
    with pytest.raises(ValueError, match="come together"):
        select_replicas(df, ["pk"], "ALL", rf=RF_MAP)
    with pytest.raises(ValueError, match="come together"):
        select_replicas(df, ["pk"], "ALL", rf=3, dc_col="dc")
    with pytest.raises(ValueError, match="is not a column"):
        select_replicas(df, ["pk"], "ALL", rf=RF_MAP, dc_col="dcx")


def test_multi_dc_unknown_dc_is_loud(spark):
    rows = [("a", 0, "x", 100, None, None, 1, "dc9")]
    df = spark.createDataFrame(rows, MDC_SCHEMA)
    with pytest.raises(Exception, match="not covered by the rf map"):
        select_replicas(
            df, ["pk"], "EACH_QUORUM", rf=RF_MAP, dc_col="dc"
        ).collect()


def test_each_quorum_heals_dc_local_divergence(spark):
    """The driver query's shape: dc2 carries the newer write on every
    copy; EACH_QUORUM must include a dc2 quorum for every key, so the
    healed read surfaces the newest value everywhere."""
    df = _two_dc(spark, dc2_newer=True)
    out = read_with_consistency(
        df, ["pk"], ["ck"], "EACH_QUORUM", rf=RF_MAP, dc_col="dc"
    )
    assert {r.val for r in out.collect()} == {"fresh"}
    assert out.count() == 120


def test_local_quorum_misses_remote_dc_writes(spark):
    """LOCAL_QUORUM at dc1 never reads dc2 — the dc2-only write is
    invisible, exactly Cassandra's cross-DC staleness under LOCAL_*."""
    df = _two_dc(spark, dc2_newer=True)
    out = read_with_consistency(
        df, ["pk"], ["ck"], "LOCAL_QUORUM", rf=RF_MAP,
        dc_col="dc", local_dc="dc1",
    )
    assert {r.val for r in out.collect()} == {"stale"}

    with pytest.raises(ValueError, match="mutually exclusive"):
        read_with_consistency(
            df.withColumn("repaired", df.ck == 0), ["pk"], ["ck"], "ALL",
            rf=RF_MAP, dc_col="dc", repaired_col="repaired",
        )
    with pytest.raises(ValueError, match="single replica set"):
        from cassandra_analytics_spark.operators.replicas import (
            select_replicas_repair_aware,
        )

        select_replicas_repair_aware(df, ["pk"], "ALL", rf=RF_MAP)


def test_serial_any_and_single_dc_map_conveniences():
    """Parity with the reference's full CL enum
    (data/partitioner/ConsistencyLevel.java:26-123): ANY blocks like
    ONE, SERIAL like QUORUM, LOCAL_SERIAL like LOCAL_QUORUM; a
    SINGLE-DC rf map accepts LOCAL_* without local_dc (the
    getNetworkTopologyRf null-DC convenience)."""
    from cassandra_analytics_spark.operators.replicas import (
        block_for,
        block_for_per_dc,
    )

    assert block_for("ANY", 3) == 1
    assert block_for("SERIAL", 3) == 2
    assert block_for("LOCAL_SERIAL", 3) == 2
    assert block_for("ANY", RF_MAP) == 1
    assert block_for("SERIAL", RF_MAP) == 3
    assert block_for("LOCAL_SERIAL", RF_MAP, local_dc="dc2") == 2
    # single-DC map: local_dc optional for the LOCAL_* levels
    assert block_for("LOCAL_QUORUM", {"dc1": 5}) == 3
    assert block_for("LOCAL_ONE", {"dc1": 5}) == 1
    assert block_for_per_dc("LOCAL_SERIAL", {"dc1": 5}) == {"dc1": 3}
    # multi-DC still requires it
    with pytest.raises(ValueError, match="needs local_dc"):
        block_for("LOCAL_SERIAL", RF_MAP)


def test_write_consistency_satisfied_mirrors_reference():
    """bulkwriter/token/ConsistencyLevel.java canBeSatisfied parity:
    pending instances INFLATE the needed success count (the javadoc's
    own example: rf=3 with 2 pending -> QUORUM needs 4, ONE needs 3,
    TWO needs 4); per-DC levels count within each DC and refuse flat
    (SimpleStrategy) rf."""
    from cassandra_analytics_spark.operators.replicas import (
        write_consistency_satisfied as ok,
    )

    # the reference javadoc example (rf=3, 2 pending, global levels)
    p2 = ["dc1", "dc1"]
    five = ["dc1"] * 5
    assert ok(five[:4], p2, "QUORUM", 3) and not ok(five[:3], p2, "QUORUM", 3)
    assert ok(five[:3], p2, "ONE", 3) and not ok(five[:2], p2, "ONE", 3)
    assert ok(five[:4], p2, "TWO", 3) and not ok(five[:3], p2, "TWO", 3)
    assert ok(five[:5], p2, "ALL", 3) and not ok(five[:4], p2, "ALL", 3)

    # EACH_QUORUM: quorum in EVERY dc, pending counted per-dc
    succ = ["dc1", "dc1", "dc2", "dc2"]
    assert ok(succ, [], "EACH_QUORUM", RF_MAP)
    assert not ok(succ[:3], [], "EACH_QUORUM", RF_MAP)  # dc2 short
    # a dc1 pending raises dc1's bar to 3
    assert not ok(succ, ["dc1"], "EACH_QUORUM", RF_MAP)
    assert ok(["dc1"] * 3 + ["dc2"] * 2, ["dc1"], "EACH_QUORUM", RF_MAP)

    # LOCAL_* ignore remote successes/pendings entirely
    assert ok(["dc1", "dc1"], ["dc2", "dc2"], "LOCAL_QUORUM", RF_MAP,
              local_dc="dc1")
    assert not ok(["dc1", "dc2", "dc2"], [], "LOCAL_QUORUM", RF_MAP,
                  local_dc="dc1")
    assert ok(["dc2"], ["dc1"], "LOCAL_ONE", RF_MAP, local_dc="dc2")
    assert not ok(["dc2"], ["dc2"], "LOCAL_ONE", RF_MAP, local_dc="dc2")

    # NTS-only levels refuse flat rf; read-only levels refused outright
    with pytest.raises(ValueError, match="NetworkTopologyStrategy"):
        ok(["dc1"], [], "LOCAL_QUORUM", 3, local_dc="dc1")
    with pytest.raises(ValueError, match="NetworkTopologyStrategy"):
        ok(["dc1"], [], "EACH_QUORUM", 3)
    for bad in ("THREE", "ANY", "SERIAL"):
        with pytest.raises(ValueError, match="unsupported write"):
            ok(["dc1"], [], bad, 3)
    with pytest.raises(ValueError, match="local_dc cannot be None"):
        ok(["dc1"], [], "LOCAL_ONE", RF_MAP)


def test_dc_names_compare_case_insensitively():
    """The reference's countInDc is equalsIgnoreCase
    (bulkwriter/token/ConsistencyLevel.java): instances reporting 'DC1'
    against an rf map keyed 'dc1' must still count (r11 ADVICE low 1 —
    this used to return False where the reference returns True)."""
    from cassandra_analytics_spark.operators.replicas import (
        block_for_per_dc,
        write_consistency_satisfied as ok,
    )

    cased_map = {"Dc1": 3, "DC2": 2}
    assert ok(["DC1", "dc1", "Dc2", "dc2"], [], "EACH_QUORUM", cased_map)
    # LOCAL_QUORUM: 2 cased-local successes < quorum(3)+1 pending = 3
    assert not ok(["DC1", "DC1"], ["dc1"], "LOCAL_QUORUM", RF_MAP,
                  local_dc="Dc1")
    assert ok(["DC1"] * 3, ["dc1"], "LOCAL_QUORUM", RF_MAP, local_dc="Dc1")
    # the read-side math casefolds too
    assert block_for("LOCAL_QUORUM", cased_map, local_dc="dc1") == 2
    assert block_for_per_dc("EACH_QUORUM", cased_map) == {"dc1": 2,
                                                          "dc2": 2}
    # keys that collide after normalization are an ambiguous config
    with pytest.raises(ValueError, match="collide"):
        block_for("QUORUM", {"DC1": 3, "dc1": 2})


def test_multi_dc_selection_indexes_validated_map(spark):
    """select_replicas must index the VALIDATED rf map, not the
    caller's raw one (r11 ADVICE low 2 — non-string DC keys used to
    pass validation then KeyError at rf[dc]); cased map keys and cased
    dc-column values select identically to the lowercase baseline."""
    from pyspark.sql import functions as F

    df = _two_dc(spark)
    base = select_replicas(df, ["pk"], "EACH_QUORUM", rf=RF_MAP,
                           dc_col="dc")
    cased = select_replicas(df, ["pk"], "EACH_QUORUM",
                            rf={"DC1": 3, "Dc2": 2}, dc_col="dc")
    assert base.exceptAll(cased).count() == 0
    assert cased.exceptAll(base).count() == 0

    class _Name:  # non-string key: str()s to a valid DC name
        def __init__(self, s):
            self.s = s

        def __str__(self):
            return self.s

    nonstr = select_replicas(
        df, ["pk"], "EACH_QUORUM",
        rf={_Name("dc1"): 3, _Name("dc2"): 2}, dc_col="dc",
    )
    assert base.exceptAll(nonstr).count() == 0

    # cased COLUMN values count too (equalsIgnoreCase on both sides)
    upper = select_replicas(df.withColumn("dc", F.upper("dc")), ["pk"],
                            "EACH_QUORUM", rf=RF_MAP, dc_col="dc")
    assert upper.count() == base.count()


def test_vnode_ownership_selection(spark):
    """select_replicas_vnode (CassandraRing.java:181-191): ownership
    follows the vnode ring's segments — the first rf distinct instances
    clockwise from the token's segment — not a modular rotation. Checks
    exact owner sets per segment, the wrap segment, case-insensitive
    DCs, LOCAL_* remote-DC exclusion, and that the uniform ring-walk
    stand-in genuinely disagrees over an irregular ring."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.operators.replicas import (
        select_replicas_vnode,
    )

    ring = [
        (60, 2, "dc1"), (180, 1, "dc1"), (310, 4, "dc1"), (430, 2, "dc1"),
        (550, 3, "dc1"), (675, 1, "dc1"), (800, 4, "dc1"), (930, 3, "dc1"),
        (100, 2, "dc2"), (260, 3, "dc2"), (420, 1, "dc2"),
        (580, 3, "dc2"), (740, 2, "dc2"), (900, 1, "dc2"),
    ]
    rf = {"dc1": 2, "dc2": 2}
    # every instance of every DC holds a copy of every key
    keys = [0, 60, 61, 500, 931, 999]  # segment starts/ends + wrap
    rows = [
        (k, dc, i)
        for k in keys
        for dc, n in (("dc1", 4), ("dc2", 3))
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "pk long, dc string, replica_id int")
    tok = F.pmod(F.col("pk"), F.lit(1000))
    sel = select_replicas_vnode(
        df, ["pk"], ring, "EACH_QUORUM", rf=rf, dc_col="dc",
        token_expr=tok,
    )
    got = {
        (r.pk, r.dc): set()
        for r in sel.select("pk", "dc").distinct().collect()
    }
    for r in sel.collect():
        got[(r.pk, r.dc)].add(r.replica_id)
    # hand-derived owner sets (same derivation as the driver oracle)
    assert got[(0, "dc1")] == {2, 1} and got[(0, "dc2")] == {2, 3}
    assert got[(60, "dc1")] == {2, 1}      # boundary: t <= 60 is seg 0
    assert got[(61, "dc1")] == {1, 4}      # next segment
    assert got[(500, "dc1")] == {3, 1} and got[(500, "dc2")] == {3, 2}
    assert got[(931, "dc1")] == {2, 1}     # wrap segment = seg 0's set
    assert got[(999, "dc2")] == {2, 3}

    # the uniform pmod stand-in disagrees over this irregular ring: at
    # quorum=rf it keeps EVERY copy (any id passes the mod-rf walk),
    # while true ownership keeps only the owners' copies
    stand_in = select_replicas(
        df, ["pk"], "EACH_QUORUM", rf=rf, dc_col="dc"
    )
    assert stand_in.exceptAll(sel).count() > 0
    assert sel.count() < stand_in.count()

    # cased DC column values and ring/map keys still select identically
    cased = select_replicas_vnode(
        df.withColumn("dc", F.upper("dc")), ["pk"],
        [(t, i, d.upper()) for t, i, d in ring],
        "EACH_QUORUM", rf={"DC1": 2, "Dc2": 2}, dc_col="dc",
        token_expr=tok,
    )
    assert cased.count() == sel.count()

    # LOCAL_QUORUM touches only the local DC
    local = select_replicas_vnode(
        df, ["pk"], ring, "LOCAL_QUORUM", rf=rf, dc_col="dc",
        local_dc="dc2", token_expr=tok,
    )
    assert local.filter(F.col("dc") == "dc1").count() == 0
    assert local.filter(F.col("dc") == "dc2").count() == 2 * len(keys)


def test_vnode_selection_validation(spark):
    """Named errors: empty ring, malformed entries, duplicate vnode
    tokens, too few distinct instances for the CL, rf-map/dc_col
    pairing, DC missing from the ring, uncovered row DC is loud."""
    from pyspark.sql import functions as F

    from cassandra_analytics_spark.operators.replicas import (
        select_replicas_vnode,
    )

    df = spark.createDataFrame(
        [(1, "dc1", 1)], "pk long, dc string, replica_id int"
    )
    single = spark.createDataFrame([(1, 1)], "pk long, replica_id int")
    with pytest.raises(ValueError, match="ring is empty"):
        select_replicas_vnode(single, ["pk"], [], "QUORUM", rf=3)
    with pytest.raises(ValueError, match="pairs"):
        select_replicas_vnode(single, ["pk"], [(1, 1, "dc1")], "ONE", rf=1)
    with pytest.raises(ValueError, match="triples"):
        select_replicas_vnode(
            df, ["pk"], [(1, 1)], "ONE", rf={"dc1": 1}, dc_col="dc"
        )
    with pytest.raises(ValueError, match="duplicate vnode tokens"):
        select_replicas_vnode(
            single, ["pk"], [(5, 1), (5, 2)], "ONE", rf=2
        )
    with pytest.raises(ValueError, match="impossible"):
        select_replicas_vnode(
            single, ["pk"], [(5, 1), (9, 1)], "QUORUM", rf=2
        )
    with pytest.raises(ValueError, match="come together"):
        select_replicas_vnode(df, ["pk"], [(1, 1)], "ONE", rf=3, dc_col="dc")
    with pytest.raises(ValueError, match="no vnodes in the ring"):
        select_replicas_vnode(
            df, ["pk"], [(1, 1, "dc1")], "EACH_QUORUM",
            rf={"dc1": 1, "dc2": 1}, dc_col="dc",
        )
    with pytest.raises(Exception, match="not covered by the rf map"):
        select_replicas_vnode(
            spark.createDataFrame(
                [(1, "dc9", 1)], "pk long, dc string, replica_id int"
            ),
            ["pk"], [(1, 1, "dc1")], "ONE", rf={"dc1": 1}, dc_col="dc",
        ).collect()
