"""Partition-key filter pushdown semantics (reference operator F1).

The reference pushes a filter down to the storage layer ONLY when it
constrains **every** partition-key column with ``EqualTo`` or ``In``
(all-or-nothing accept-list, ``data/DataLayer.java:304-337``;
cartesian-product key expansion ``CassandraScanBuilder.java:127-148``,
``utils/FilterUtils.java:45-112``). Clustering-key predicates are never
pushed (``DataLayer.java:325-332``) — Spark evaluates them post-scan.

Over parquet, Catalyst pushes any comparable predicate for free; what this
module preserves is the reference's *API semantics*: classifying which
filters the reference would push, expanding pk value combinations to token
point-lookups, and a guard for workloads that must not full-scan.
"""

from __future__ import annotations

import itertools
from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_spark.functions.tokens import token_column


@dataclass(frozen=True)
class PartitionKeyFilter:
    """One fully-specified partition-key restriction: column → values
    (EqualTo = single value, In = several)."""

    values: Mapping[str, tuple]

    def key_combinations(self) -> list[tuple]:
        """Cartesian product of per-column values — the reference's key
        tuple expansion (FilterUtils.java:45-112). Column order is the
        mapping's insertion order, which classify_filters builds in
        partition-key DECLARATION order — the engine token convention
        (tokenize, bulk_writer) hashes keys in that order, so sorting
        alphabetically here would compute wrong tokens for any composite
        key whose declaration order differs from its lexical order."""
        return list(itertools.product(*self.values.values()))


def classify_filters(
    partition_keys: Sequence[str],
    eq_in_filters: Mapping[str, Sequence],
) -> PartitionKeyFilter | None:
    """Return the pushable filter iff ALL partition-key columns are
    constrained (the all-or-nothing rule); else None (post-scan filtering).
    """
    if set(partition_keys) <= set(eq_in_filters):
        return PartitionKeyFilter(
            values={k: tuple(eq_in_filters[k]) for k in partition_keys}
        )
    return None


def scan_with_pk_filter(
    df: DataFrame,
    partition_keys: Sequence[str],
    eq_in_filters: Mapping[str, Sequence],
    require_full_pk: bool = False,
) -> DataFrame:
    """Apply EqualTo/In filters the way the reference's scan does.

    With ``require_full_pk=True``, raise unless the filter constrains every
    partition-key column — the guard a 100 TB deployment wants so a missing
    pk predicate cannot silently become a full scan.
    """
    pushed = classify_filters(partition_keys, eq_in_filters)
    if require_full_pk and pushed is None:
        missing = set(partition_keys) - set(eq_in_filters)
        raise ValueError(
            "partition-key filter must constrain every partition-key column "
            f"(missing: {sorted(missing)}); the reference rejects partial pk "
            "pushdown (DataLayer.java:304-337)"
        )
    out = df
    for col, values in eq_in_filters.items():
        vals = list(values)
        out = out.filter(
            F.col(col) == vals[0] if len(vals) == 1 else F.col(col).isin(vals)
        )
    return out


def token_point_lookups(
    pk_filter: PartitionKeyFilter,
) -> list[tuple[tuple, int]]:
    """(key tuple, engine token) per combination — what the reference uses
    to prune replicas/SSTables per key (PartitionKeyFilter.java:36-85).
    Token computed with the engine's xxhash64 convention via a literal
    expression (kept here for symmetry; heavy use goes through
    ``functions.tokens.tokenize``). Key tuples come back in partition-key
    declaration order. Caveat: xxhash64 is WIDTH-sensitive, so the
    literal types below must match the table's column types — python
    ints map to bigint; a table with 32-bit int key columns needs its
    filter values tokenized against the real column (tokenize), not this
    literal path."""
    from pyspark.sql import SparkSession

    def _spark_type(v) -> str:
        if isinstance(v, bool):  # before int: bool is an int subclass
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        raise ValueError(f"unsupported partition-key literal: {v!r}")

    spark = SparkSession.getActiveSession()
    combos = pk_filter.key_combinations()
    if not combos or spark is None:
        return []
    # evaluate tokens driver-side in one tiny job
    from cassandra_analytics_spark.local_data import local_df

    rows = local_df(spark, combos, ", ".join(
        f"c{i} {_spark_type(v)}" for i, v in enumerate(combos[0])
    ))
    toks = rows.select(
        *rows.columns, token_column(*[F.col(c) for c in rows.columns]).alias("t")
    ).collect()
    return [(tuple(r[c] for c in rows.columns), r["t"]) for r in toks]
