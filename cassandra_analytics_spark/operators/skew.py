"""Skew-handling primitives for hot keys at 100 TB.

AQE's skew-join splitting (enabled in the session factory) covers
sort-merge joins at runtime; these operators cover the cases AQE doesn't:
skewed aggregation (two-phase salted partial/final) and explicitly salted
broadcast-free joins when the hot side is known.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the hot key.

    ``aggs``: out_col → (function, in_col) with function ∈ {sum, count,
    min, max}. Phase 1 aggregates on (keys, salt) — spreading a hot key
    over ``salt_buckets`` reducers; phase 2 merges the partials. All four
    functions have exact merge semantics (sum↦sum, count↦sum, min↦min,
    max↦max), so the result equals the unsalted aggregation. ``count``
    follows SQL COUNT(col) — non-null values of ``in_col``; pass
    ``in_col="*"`` for COUNT(*) row counting.
    """
    supported = {"sum", "count", "min", "max"}
    for out, (fn, _) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: {fn!r} has no exact partial merge")
    if int(salt_buckets) < 1:
        # pmod by zero used to throw ANSI REMAINDER_BY_ZERO deep inside
        # the job; negative bucket counts only worked by accident
        raise ValueError(
            f"salted_aggregate: salt_buckets must be >= 1, got {salt_buckets}"
        )
    if "__salt" in df.columns:
        # withColumn would silently OVERWRITE the caller's column and the
        # result would drop it — silent data loss (round-10 probe)
        raise ValueError(
            "salted_aggregate: input already has a '__salt' column — the "
            "operator reserves that name; rename it first"
        )

    def _phase1(fn: str, c: str):
        if fn != "count":
            return getattr(F, fn)(F.col(c))
        # SQL COUNT semantics: COUNT(*) counts rows, COUNT(col) counts
        # non-null values (ignoring in_col here silently overcounted
        # nullable columns)
        return F.count(F.lit(1)) if c == "*" else F.count(F.col(c))

    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_phase1(fn, c).alias(f"__p_{out}") for out, (fn, c) in aggs.items()]
    )
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[
            merge_fn[fn](F.col(f"__p_{out}")).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate the other side across every salt bucket, join on
    (keys, salt). Result is row-identical to the plain join; the hot key's
    rows spread over ``salt_buckets`` tasks instead of one straggler.

    Only left-preserving joins are allowed: in a right/full outer join
    every replica of a ``small`` row that finds no partner in its salt
    bucket would emit its own null-padded row — up to ``salt_buckets``
    spurious duplicates per unmatched right row, NOT row-identical to
    the plain join.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side breaks right/full outer semantics (each unmatched "
            "replica would emit its own null-padded row)"
        )
    if int(salt_buckets) < 1:
        raise ValueError(
            f"salted_join: salt_buckets must be >= 1, got {salt_buckets}"
        )
    for side, frame in (("skewed", skewed), ("small", small)):
        if "__salt" in frame.columns:
            raise ValueError(
                f"salted_join: the {side} side already has a '__salt' "
                "column — the operator reserves that name; rename it first"
            )
    keys = list(on)
    left = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(left.schema["__salt"].dataType))
    joined = left.join(right, keys + ["__salt"], how)
    return joined.drop("__salt")
