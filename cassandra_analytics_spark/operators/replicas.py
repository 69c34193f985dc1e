"""Replica selection + consistency-level emulation (reference M3).

The reference chooses ``blockFor(CL, RF)`` replicas per token range and
merges their SSTables (``data/PartitionedDataLayer.java:244-305``,
``data/partitioner/ConsistencyLevel.java:26-123``). Over shared storage
there is no availability problem to solve, but the *semantics* — how many
replicas' data participates in a read, and that the LWW merge reconciles
replica divergence — are reproducible over fixtures carrying a
``replica_id`` column (FIXTURES.md §B encoding).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_spark.functions.tokens import token_column
from cassandra_analytics_spark.operators.merge import REPLICA_ID, compaction_merge

_CLS = ("ANY", "ONE", "TWO", "THREE", "QUORUM", "ALL", "SERIAL",
        "LOCAL_ONE", "LOCAL_QUORUM", "LOCAL_SERIAL", "EACH_QUORUM")


def _norm_dc(dc: object) -> str:
    """Normalize a datacenter name for comparison. The reference counts
    DC membership case-insensitively (``bulkwriter/token/
    ConsistencyLevel.java`` ``countInDc`` uses ``equalsIgnoreCase``), so
    instances reporting ``'DC1'`` against an rf map keyed ``'dc1'`` must
    still count. ``str.lower()`` mirrors Java's per-char comparison for
    the ASCII names DCs carry in practice."""
    return str(dc).lower()


def _validate_rf_map(rf: Mapping[str, int]) -> dict[str, int]:
    """Validate and NORMALIZE a per-DC rf map: keys lowercased (the
    reference's DC comparisons are equalsIgnoreCase throughout), values
    coerced to int >= 1. Two keys that collide after normalization
    (``{'DC1': 3, 'dc1': 2}``) are an ambiguous config and refused.
    Every consumer must index THIS returned map, never the caller's raw
    one — raw maps may carry non-string or differently-cased keys."""
    if not rf:
        raise ValueError("block_for: the per-DC rf map is empty")
    out: dict[str, int] = {}
    for dc, r in rf.items():
        if int(r) < 1:
            raise ValueError(
                f"block_for: rf must be >= 1 in every DC, got {dc!r}: {r}"
            )
        key = _norm_dc(dc)
        if key in out:
            raise ValueError(
                f"block_for: rf map keys {sorted(rf)} collide on "
                f"{key!r} after case-insensitive normalization "
                "(DC names compare equalsIgnoreCase in the reference)"
            )
        out[key] = int(r)
    return out


def block_for(
    consistency: str,
    rf: int | Mapping[str, int],
    local_dc: str | None = None,
) -> int:
    """TOTAL replicas a read must block for (ConsistencyLevel.java:26-123).

    ``rf`` is either a single int — SimpleStrategy / a one-DC cluster,
    where the LOCAL_*/EACH_QUORUM levels collapse to their single-DC
    forms (LOCAL_QUORUM == QUORUM, EACH_QUORUM == QUORUM, LOCAL_ONE ==
    ONE; this module's historical behavior, now explicit) — or a per-DC
    map ``{dc: rf}`` mirroring NetworkTopologyStrategy's
    ``ReplicationFactor``, where the reference computes
    (``ConsistencyLevel.java:26-123``):

    - ``EACH_QUORUM``: the SUM of per-DC local quorums (quorum in
      EVERY datacenter),
    - ``LOCAL_QUORUM``/``LOCAL_SERIAL`` / ``LOCAL_ONE``: quorum of /
      one in the LOCAL DC only — ``local_dc`` required unless the map
      has exactly ONE datacenter (the reference's
      ``getNetworkTopologyRf`` null-DC convenience),
    - ``QUORUM``/``SERIAL`` / ``ALL`` / ``ANY``/``ONE``/``TWO``/
      ``THREE``: over the total replica count across DCs (``ANY`` and
      the SERIAL levels share their non-serial twins' blockFor, as in
      the reference — the Paxos/hinted-handoff mechanics they add are
      write-path concerns with no analog over shared storage).

    rf < 1 is refused here (it used to surface as an ANSI pmod-by-zero
    deep inside the selection job), and a consistency level whose
    blockFor exceeds the available replicas is an impossible config —
    Cassandra throws UnavailableException for it at read time; silently
    selecting every replica would quietly weaken the caller's requested
    guarantee (round-10 probe)."""
    cl = consistency.upper()
    if cl not in _CLS:
        raise ValueError(f"unsupported consistency level: {consistency}")
    if isinstance(rf, Mapping):
        rf_map = _validate_rf_map(rf)
        if local_dc is not None:
            local_dc = _norm_dc(local_dc)
        if cl.startswith("LOCAL_"):
            if local_dc is None and len(rf_map) == 1:
                # single-DC map + unspecified DC: the reference's
                # getNetworkTopologyRf uses the only DC's rf
                local_dc = next(iter(rf_map))
            if local_dc is None:
                raise ValueError(
                    f"block_for: {cl} against a multi-DC rf map needs "
                    "local_dc= (the level is defined relative to the "
                    "coordinator's datacenter)"
                )
            if local_dc not in rf_map:
                raise ValueError(
                    f"block_for: local_dc {local_dc!r} is not in the rf "
                    f"map {sorted(rf_map)}"
                )
        total_rf = sum(rf_map.values())
        if cl == "EACH_QUORUM":
            n = sum(r // 2 + 1 for r in rf_map.values())
        elif cl in ("LOCAL_QUORUM", "LOCAL_SERIAL"):
            n = rf_map[local_dc] // 2 + 1
        elif cl == "LOCAL_ONE":
            n = 1
        elif cl in ("QUORUM", "SERIAL"):
            n = total_rf // 2 + 1
        elif cl == "ALL":
            n = total_rf
        else:
            n = {"ANY": 1, "ONE": 1, "TWO": 2, "THREE": 3}[cl]
        if n > total_rf:
            raise ValueError(
                f"consistency {consistency} needs {n} replicas but the "
                f"cluster has {total_rf} ({dict(sorted(rf_map.items()))}) — "
                "an impossible configuration (Cassandra: "
                "UnavailableException)"
            )
        return n
    if int(rf) < 1:
        raise ValueError(f"block_for: rf must be >= 1, got {rf}")
    rf = int(rf)
    if cl in ("ANY", "ONE", "LOCAL_ONE"):
        n = 1
    elif cl == "TWO":
        n = 2
    elif cl == "THREE":
        n = 3
    elif cl in ("QUORUM", "SERIAL", "LOCAL_QUORUM", "LOCAL_SERIAL",
                "EACH_QUORUM"):
        n = rf // 2 + 1
    elif cl == "ALL":
        n = rf
    if n > rf:
        raise ValueError(
            f"consistency {consistency} needs {n} replicas but rf={rf} — "
            "an impossible configuration (Cassandra: UnavailableException)"
        )
    return n


def block_for_per_dc(
    consistency: str,
    rf: Mapping[str, int],
    local_dc: str | None = None,
) -> dict[str, int]:
    """Replicas to SELECT in each DC — the per-DC split of
    :func:`block_for` that multi-DC selection filters on.

    Per-DC levels are exact (EACH_QUORUM: a local quorum in every DC;
    LOCAL_*: the local DC only). For the GLOBAL levels (ONE/TWO/THREE/
    QUORUM/ALL) Cassandra picks any blockFor replicas snitch-sorted by
    proximity; this module's deterministic stand-in fills the LOCAL DC
    first (when given), then the remaining DCs in name order, each up to
    its rf — the same total count, a reproducible choice of which
    copies participate."""
    cl = consistency.upper()
    rf_map = _validate_rf_map(rf)
    if local_dc is not None:
        local_dc = _norm_dc(local_dc)
    total = block_for(consistency, rf_map, local_dc)  # validates everything
    if cl.startswith("LOCAL_") and local_dc is None:
        local_dc = next(iter(rf_map))  # single-DC map (block_for validated)
    if cl == "EACH_QUORUM":
        return {dc: r // 2 + 1 for dc, r in rf_map.items()}
    if cl in ("LOCAL_QUORUM", "LOCAL_SERIAL"):
        return {
            dc: (rf_map[local_dc] // 2 + 1 if dc == local_dc else 0)
            for dc in rf_map
        }
    if cl == "LOCAL_ONE":
        return {dc: (1 if dc == local_dc else 0) for dc in rf_map}
    # global levels: fill local-first, then name order
    order = sorted(rf_map)
    if local_dc is not None and local_dc in rf_map:
        order = [local_dc] + [d for d in order if d != local_dc]
    out = {dc: 0 for dc in rf_map}
    remaining = total
    for dc in order:
        take = min(remaining, rf_map[dc])
        out[dc] = take
        remaining -= take
    return out


_WRITE_CLS = ("ALL", "EACH_QUORUM", "QUORUM", "LOCAL_QUORUM",
              "ONE", "TWO", "LOCAL_ONE")


def write_consistency_satisfied(
    succeeded_dcs: Sequence[str],
    pending_dcs: Sequence[str],
    consistency: str,
    rf: int | Mapping[str, int],
    local_dc: str | None = None,
) -> bool:
    """The bulk WRITE path's consistency check — a mirror of the
    reference's ``bulkwriter/token/ConsistencyLevel.java:30-234``
    ``canBeSatisfied``: with pending instances (JOINING/LEAVING/MOVING),
    the minimum success count is INFLATED by the pending count so the
    guarantee still holds after the topology change settles (Cassandra's
    ``blockForWrite``). E.g. rf=3 with 2 pending: QUORUM needs
    quorum(3)+2 = 4 successes, ONE needs 1+2 = 3.

    ``succeeded_dcs``/``pending_dcs`` are the DATACENTER names of the
    succeeded/pending replicas (the math uses only per-DC counts).
    Per-DC levels (EACH_QUORUM, LOCAL_*) count within each datacenter
    and — like the reference's ``ensureNetworkTopologyStrategy`` —
    REFUSE a flat int rf: they only make sense for
    NetworkTopologyStrategy keyspaces. The write enum is exactly the
    reference's seven levels; THREE/ANY/SERIAL are read-side-only there
    and refused here.

    Returning True means the level is DEFINITIVELY satisfied; False
    means no conclusion (more instances may still succeed) — the
    reference's exact contract."""
    cl = consistency.upper()
    if cl not in _WRITE_CLS:
        raise ValueError(
            f"unsupported write consistency level: {consistency} (the "
            f"reference's bulk-write enum is {list(_WRITE_CLS)})"
        )
    # DC names count case-insensitively (countInDc is equalsIgnoreCase)
    succeeded = [_norm_dc(d) for d in succeeded_dcs]
    pending = [_norm_dc(d) for d in pending_dcs]
    if local_dc is not None:
        local_dc = _norm_dc(local_dc)
    if cl in ("EACH_QUORUM", "LOCAL_QUORUM", "LOCAL_ONE"):
        if not isinstance(rf, Mapping):
            raise ValueError(
                f"{cl} only makes sense for NetworkTopologyStrategy "
                "keyspaces — pass rf as a per-DC map "
                "(bulkwriter ConsistencyLevel.ensureNetworkTopologyStrategy)"
            )
        rf_map = _validate_rf_map(rf)
        if cl == "EACH_QUORUM":
            return all(
                sum(1 for d in succeeded if d == dc)
                >= r // 2 + 1 + sum(1 for d in pending if d == dc)
                for dc, r in rf_map.items()
            )
        if local_dc is None:
            raise ValueError(f"{cl}: local_dc cannot be None")
        if local_dc not in rf_map:
            raise ValueError(
                f"local_dc {local_dc!r} is not in the rf map "
                f"{sorted(rf_map)}"
            )
        succ_local = sum(1 for d in succeeded if d == local_dc)
        pend_local = sum(1 for d in pending if d == local_dc)
        need = rf_map[local_dc] // 2 + 1 if cl == "LOCAL_QUORUM" else 1
        return succ_local >= need + pend_local
    total_rf = (
        sum(_validate_rf_map(rf).values())
        if isinstance(rf, Mapping)
        else int(rf)
    )
    if total_rf < 1:
        raise ValueError(f"rf must be >= 1, got {rf}")
    need = {
        "ALL": total_rf,
        "QUORUM": total_rf // 2 + 1,
        "ONE": 1,
        "TWO": 2,
    }[cl]
    return len(succeeded) >= need + len(pending)


def select_replicas(
    df: DataFrame,
    partition_keys: Sequence[str],
    consistency: str = "LOCAL_QUORUM",
    rf: int | Mapping[str, int] = 3,
    replica_col: str = REPLICA_ID,
    dc_col: str | None = None,
    local_dc: str | None = None,
) -> DataFrame:
    """Keep the rows of the ``blockFor(CL, RF)`` replicas chosen per
    partition.

    Replica preference order rotates with the token (the ring walk:
    primary = token mod rf, then successors) so load spreads like the
    reference's ring-aware selection. Pure expression filter — no shuffle.

    MULTI-DC (NetworkTopologyStrategy): pass ``rf`` as a per-DC map and
    name the ``dc_col`` carrying each row's datacenter (FIXTURES.md §B:
    replica ids are 1-based WITHIN their DC). Selection then runs a
    per-DC ring walk with that DC's rf and keeps
    :func:`block_for_per_dc`'s count in each DC — EACH_QUORUM keeps a
    quorum in EVERY DC, LOCAL_* only touches ``local_dc``
    (``ConsistencyLevel.java:26-123`` semantics). A row whose DC is not
    in the map (or NULL) fails LOUDLY — it would otherwise silently
    vanish from every read. A map without ``dc_col`` (or vice versa) is
    refused: one names replica placement the other can't see.

    Domain contract (round-8 pass, documented rather than policed — a
    row-level check would cost an extra action on a pure filter): rows
    with a NULL ``replica_col`` are dropped (NULL ring distance fails
    the filter), and an id outside [1, rf] wraps around the ring
    (pmod) — fixtures encode 1-based ids within the replication factor
    (FIXTURES.md §B), matching the reference where such ids cannot
    occur.
    """
    if (dc_col is None) != (not isinstance(rf, Mapping)):
        raise ValueError(
            "select_replicas: a per-DC rf map and dc_col come together — "
            f"got rf={rf!r} with dc_col={dc_col!r}; pass both (multi-DC) "
            "or neither (single-DC int rf)"
        )
    tok = token_column(*[F.col(k) for k in partition_keys])
    if dc_col is None:
        n = block_for(consistency, rf)
        primary = F.pmod(tok, F.lit(rf))  # 0-based primary for this key
        # replica r (1-based) is selected iff its ring distance from the
        # primary is < n
        distance = F.pmod(F.col(replica_col) - 1 - primary, F.lit(rf))
        return df.filter(distance < n)
    if dc_col not in df.columns:
        raise ValueError(
            f"select_replicas: dc_col {dc_col!r} is not a column of the "
            f"input ({df.columns})"
        )
    # Index the VALIDATED (normalized) map, never the caller's raw one:
    # block_for_per_dc returns normalized keys, so rf[dc] on a raw map
    # with non-string or differently-cased keys would KeyError / miss.
    rf_map = _validate_rf_map(rf)
    per_dc = block_for_per_dc(consistency, rf_map, local_dc)
    dc_expr = F.lower(F.col(dc_col).cast("string"))  # equalsIgnoreCase
    keep = None
    for dc in sorted(per_dc):
        rf_dc, n_dc = rf_map[dc], per_dc[dc]
        primary = F.pmod(tok, F.lit(rf_dc))
        distance = F.pmod(F.col(replica_col) - 1 - primary, F.lit(rf_dc))
        cond = distance < F.lit(n_dc)
        keep = (
            F.when(dc_expr == dc, cond)
            if keep is None
            else keep.when(dc_expr == dc, cond)
        )
    keep = keep.otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "select_replicas: row in datacenter not covered by the "
                    "rf map "
                ),
                F.lit(str(sorted(per_dc))),
                F.lit(": "),
                F.coalesce(F.col(dc_col).cast("string"), F.lit("<NULL>")),
            )
        ).cast("boolean")
    )
    return df.filter(keep)


def _vnode_selection_sets(
    entries: list[tuple[int, object]],
    n: int,
    label: str,
) -> list[tuple[int, frozenset]]:
    """Per ring segment, the first ``n`` DISTINCT instances walking
    clockwise from the segment's owning vnode — the replica set Cassandra
    derives for every token in that segment (``CassandraRing.java:
    181-191``: the primary owns the first vnode token >= t, the rest are
    the next distinct instances clockwise, skipping repeat vnodes of an
    already-chosen instance). Returns [(segment_end_token, instances)]
    in ring order; tokens above the last vnode wrap to segment 0."""
    entries = sorted(entries)
    tokens = [t for t, _ in entries]
    if len(set(tokens)) != len(tokens):
        raise ValueError(
            f"select_replicas_vnode: duplicate vnode tokens in {label} — "
            "each ring position is owned by exactly one instance"
        )
    distinct = {i for _, i in entries}
    if len(distinct) < n:
        raise ValueError(
            f"select_replicas_vnode: {label} has {len(distinct)} distinct "
            f"instances but the consistency level needs {n} — impossible "
            "configuration (Cassandra: UnavailableException)"
        )
    out = []
    k = len(entries)
    for i in range(k):
        sel: list = []
        for step in range(k):
            inst = entries[(i + step) % k][1]
            if inst not in sel:
                sel.append(inst)
            if len(sel) == n:
                break
        out.append((entries[i][0], frozenset(sel)))
    return out


def _vnode_member_expr(
    sets: list[tuple[int, frozenset]],
    tok,
    replica_col: str,
):
    """token-segment dispatch as ONE chained CASE expression: segment
    for token t is the first vnode token >= t, wrapping past the last
    vnode to segment 0. Constant-folded, codegen, no shuffle — a linear
    scan in #vnodes per row; at production vnode counts (256/node) the
    scale path is a broadcast range-join against the exploded ownership
    table, same driver-side math."""
    member = None
    for end_tok, sel in sets:
        cond = F.col(replica_col).isin(*sorted(sel))
        member = (
            F.when(tok <= F.lit(end_tok), cond)
            if member is None
            else member.when(tok <= F.lit(end_tok), cond)
        )
    wrap = F.col(replica_col).isin(*sorted(sets[0][1]))
    return member.otherwise(wrap)


def select_replicas_vnode(
    df: DataFrame,
    partition_keys: Sequence[str],
    ring: Sequence[tuple],
    consistency: str = "LOCAL_QUORUM",
    rf: int | Mapping[str, int] = 3,
    replica_col: str = REPLICA_ID,
    dc_col: str | None = None,
    local_dc: str | None = None,
    token_expr=None,
) -> DataFrame:
    """Replica selection under TRUE per-DC vnode token ownership — the
    exact ``CassandraRing.java:181-191`` semantics that
    :func:`select_replicas`'s uniform ring-walk stands in for: which
    instances hold a partition depends on WHERE its token falls between
    the cluster's vnode positions, not on a modular rotation, so two
    keys in adjacent ranges can live on entirely different instances.

    ``ring`` carries the cluster's vnode table: ``(token, instance_id)``
    entries (single-DC, int ``rf``) or ``(token, instance_id, dc)``
    (multi-DC, per-DC rf map + ``dc_col`` naming each row's
    datacenter, same pairing contract as :func:`select_replicas`). For
    each row the owning replica set is the first rf distinct instances
    clockwise from its token's segment IN THAT DC's ring; the CL keeps
    :func:`block_for_per_dc`-many of them (walk order = Cassandra's
    NTS replica order, so per-DC levels are exact).

    ``token_expr`` overrides the Murmur3 token (the pluggable-
    partitioner seam — fixtures and SQL oracles can use an expression
    both engines compute identically). The ring is driver-side config
    (like the IVF codebook): vnode counts are O(instances x
    num_tokens), metadata-sized at any cluster scale.

    Rows in a DC absent from the ring fail LOUDLY (they would otherwise
    silently vanish from every read), mirroring select_replicas.
    """
    if (dc_col is None) != (not isinstance(rf, Mapping)):
        raise ValueError(
            "select_replicas_vnode: a per-DC rf map and dc_col come "
            f"together — got rf={rf!r} with dc_col={dc_col!r}; pass both "
            "(multi-DC) or neither (single-DC int rf)"
        )
    if not ring:
        raise ValueError("select_replicas_vnode: the vnode ring is empty")
    tok = (
        token_expr
        if token_expr is not None
        else token_column(*[F.col(k) for k in partition_keys])
    )
    if dc_col is None:
        if any(len(e) != 2 for e in ring):
            raise ValueError(
                "select_replicas_vnode: single-DC ring entries are "
                "(token, instance_id) pairs"
            )
        n = block_for(consistency, rf)
        sets = _vnode_selection_sets(
            [(int(t), i) for t, i in ring], n, "the ring"
        )
        return df.filter(_vnode_member_expr(sets, tok, replica_col))
    if dc_col not in df.columns:
        raise ValueError(
            f"select_replicas_vnode: dc_col {dc_col!r} is not a column "
            f"of the input ({df.columns})"
        )
    if any(len(e) != 3 for e in ring):
        raise ValueError(
            "select_replicas_vnode: multi-DC ring entries are "
            "(token, instance_id, dc) triples"
        )
    rf_map = _validate_rf_map(rf)
    per_dc = block_for_per_dc(consistency, rf_map, local_dc)
    by_dc: dict[str, list[tuple[int, object]]] = {}
    for t, inst, dc in ring:
        by_dc.setdefault(_norm_dc(dc), []).append((int(t), inst))
    missing = sorted(set(rf_map) - set(by_dc))
    if missing:
        raise ValueError(
            f"select_replicas_vnode: rf map names datacenters with no "
            f"vnodes in the ring: {missing}"
        )
    dc_expr = F.lower(F.col(dc_col).cast("string"))  # equalsIgnoreCase
    keep = None
    for dc in sorted(per_dc):
        n_dc = per_dc[dc]
        if n_dc == 0:  # LOCAL_* remote DCs select nothing
            cond = F.lit(False)
        else:
            sets = _vnode_selection_sets(by_dc[dc], n_dc, f"DC {dc!r}")
            cond = _vnode_member_expr(sets, tok, replica_col)
        keep = (
            F.when(dc_expr == dc, cond)
            if keep is None
            else keep.when(dc_expr == dc, cond)
        )
    keep = keep.otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "select_replicas_vnode: row in datacenter not covered "
                    "by the rf map "
                ),
                F.lit(str(sorted(per_dc))),
                F.lit(": "),
                F.coalesce(F.col(dc_col).cast("string"), F.lit("<NULL>")),
            )
        ).cast("boolean")
    )
    return df.filter(keep)



def select_replicas_repair_aware(
    df: DataFrame,
    partition_keys: Sequence[str],
    consistency: str = "LOCAL_QUORUM",
    rf: int = 3,
    replica_col: str = REPLICA_ID,
    repaired_col: str = "repaired",
) -> DataFrame:
    """Incremental-repair-aware replica selection
    (``PartitionedDataLayer.java:434-495``, ``SingleReplica.isRepairPrimary``).

    Repaired SSTables are identical on every replica by definition (that
    is what repair established), so the reference streams them from ONE
    designated *repair primary* per token range and skips them on the
    other replicas — reading them CL-many times would merge the same data
    repeatedly for nothing. Unrepaired SSTables may diverge, so those are
    still read from ``blockFor(CL, RF)`` replicas and reconciled by the
    LWW merge.

    Fixture encoding: ``repaired`` boolean per row (null = unrepaired).
    The repair primary is the ring-walk primary (distance 0). Pure
    expression filter — no shuffle, composes with the merge's exchange.

    Single-DC only (int ``rf``): the reference's repair-primary election
    is defined over one replica set per range; a per-DC split of it is
    not modeled — pass a flat rf, or run per-DC inputs separately.
    """
    if isinstance(rf, Mapping):
        raise ValueError(
            "select_replicas_repair_aware models a single replica set — "
            "per-DC rf maps are not supported here; filter per DC first "
            "or use select_replicas for multi-DC CL selection"
        )
    n = block_for(consistency, rf)
    tok = token_column(*[F.col(k) for k in partition_keys])
    primary = F.pmod(tok, F.lit(rf))
    distance = F.pmod(F.col(replica_col) - 1 - primary, F.lit(rf))
    is_repaired = F.coalesce(F.col(repaired_col), F.lit(False))
    return df.filter(
        F.when(is_repaired, distance == 0).otherwise(distance < n)
    )


def read_with_consistency(
    df: DataFrame,
    partition_keys: Sequence[str],
    clustering_keys: Sequence[str] = (),
    consistency: str = "LOCAL_QUORUM",
    rf: int | Mapping[str, int] = 3,
    now_micros: int | None = None,
    repaired_col: str | None = None,
    dc_col: str | None = None,
    local_dc: str | None = None,
) -> DataFrame:
    """The reference's multi-replica read: select CL-many replicas per
    partition (repair-primary-aware when ``repaired_col`` is given), then
    compaction-merge their possibly divergent rows.

    ``dc_col`` + a per-DC ``rf`` map run the multi-DC selection
    (:func:`select_replicas`); the DC column is consumed by selection
    and dropped before the merge (replica divergence heals across DCs —
    the LWW merge is placement-blind). ``repaired_col`` and ``dc_col``
    are mutually exclusive (repair-primary election is single-replica-
    set; see :func:`select_replicas_repair_aware`).

    A ``repaired_col`` that names a missing column raises — silently
    falling back to plain CL selection would read repaired data CL-many
    times, exactly the duplication the caller asked to avoid, with no
    signal that the typo changed semantics (round-8 hostile pass; same
    bug class as the C1 PRIMARY-KEY-typo parse check)."""
    if repaired_col is not None and dc_col is not None:
        raise ValueError(
            "read_with_consistency: repaired_col and dc_col are mutually "
            "exclusive (repair-primary election is single-replica-set)"
        )
    if repaired_col is not None:
        if repaired_col not in df.columns:
            raise ValueError(
                f"read_with_consistency: repaired_col {repaired_col!r} is "
                f"not a column of the input ({df.columns}) — pass None for "
                "plain CL selection"
            )
        selected = select_replicas_repair_aware(
            df, partition_keys, consistency, rf, repaired_col=repaired_col
        ).drop(repaired_col)
    elif dc_col is not None:
        selected = select_replicas(
            df, partition_keys, consistency, rf,
            dc_col=dc_col, local_dc=local_dc,
        ).drop(dc_col)
    else:
        selected = select_replicas(df, partition_keys, consistency, rf)
    return compaction_merge(
        selected,
        partition_keys=partition_keys,
        clustering_keys=clustering_keys,
        now_micros=now_micros,
    )
