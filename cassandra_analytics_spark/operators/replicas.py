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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_spark.functions.tokens import token_column
from cassandra_analytics_spark.operators.merge import REPLICA_ID, compaction_merge


def block_for(consistency: str, rf: int) -> int:
    """Replicas a read must block for (ConsistencyLevel.java:26-123).

    rf < 1 is refused here (it used to surface as an ANSI pmod-by-zero
    deep inside the selection job), and a consistency level whose
    blockFor exceeds rf is an impossible config — Cassandra throws
    UnavailableException for it at read time; silently selecting every
    replica would quietly weaken the caller's requested guarantee
    (round-10 probe)."""
    if int(rf) < 1:
        raise ValueError(f"block_for: rf must be >= 1, got {rf}")
    cl = consistency.upper()
    if cl in ("ONE", "LOCAL_ONE"):
        n = 1
    elif cl == "TWO":
        n = 2
    elif cl == "THREE":
        n = 3
    elif cl in ("QUORUM", "LOCAL_QUORUM", "EACH_QUORUM"):
        n = rf // 2 + 1
    elif cl == "ALL":
        n = rf
    else:
        raise ValueError(f"unsupported consistency level: {consistency}")
    if n > rf:
        raise ValueError(
            f"consistency {consistency} needs {n} replicas but rf={rf} — "
            "an impossible configuration (Cassandra: UnavailableException)"
        )
    return n


def select_replicas(
    df: DataFrame,
    partition_keys: Sequence[str],
    consistency: str = "LOCAL_QUORUM",
    rf: int = 3,
    replica_col: str = REPLICA_ID,
) -> DataFrame:
    """Keep the rows of the ``blockFor(CL, RF)`` replicas chosen per
    partition.

    Replica preference order rotates with the token (the ring walk:
    primary = token mod rf, then successors) so load spreads like the
    reference's ring-aware selection. Pure expression filter — no shuffle.

    Domain contract (round-8 pass, documented rather than policed — a
    row-level check would cost an extra action on a pure filter): rows
    with a NULL ``replica_col`` are dropped (NULL ring distance fails
    the filter), and an id outside [1, rf] wraps around the ring
    (pmod) — fixtures encode 1-based ids within the replication factor
    (FIXTURES.md §B), matching the reference where such ids cannot
    occur.
    """
    n = block_for(consistency, rf)
    tok = token_column(*[F.col(k) for k in partition_keys])
    primary = F.pmod(tok, F.lit(rf))  # 0-based primary replica for this key
    # replica r (1-based) is selected iff its ring distance from the
    # primary is < n
    distance = F.pmod(F.col(replica_col) - 1 - primary, F.lit(rf))
    return df.filter(distance < n)


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
    """
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
    rf: int = 3,
    now_micros: int | None = None,
    repaired_col: str | None = None,
) -> DataFrame:
    """The reference's multi-replica read: select CL-many replicas per
    partition (repair-primary-aware when ``repaired_col`` is given), then
    compaction-merge their possibly divergent rows.

    A ``repaired_col`` that names a missing column raises — silently
    falling back to plain CL selection would read repaired data CL-many
    times, exactly the duplication the caller asked to avoid, with no
    signal that the typo changed semantics (round-8 hostile pass; same
    bug class as the C1 PRIMARY-KEY-typo parse check)."""
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
    else:
        selected = select_replicas(df, partition_keys, consistency, rf)
    return compaction_merge(
        selected,
        partition_keys=partition_keys,
        clustering_keys=clustering_keys,
        now_micros=now_micros,
    )
