"""Instrumentation hooks — the reference's C8 ``Stats`` surface
(``analytics/stats/Stats.java``: 100+ no-op-by-default callbacks around
the scan/write path), Spark-first.

Spark-native mechanism: ``DataFrame.observe`` attaches metric expressions
that are computed *inside* the job (no extra pass) and collected on
completion — the idiomatic replacement for callback-style stats at 100 TB
(no driver round-trips, no Python in the data path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def ensure_metrics_survive_empty(spark) -> None:
    """Exclude AQE's empty-relation propagation on ``spark`` so
    ``DataFrame.observe`` metrics survive EMPTY results.

    AQE's ``AQEPropagateEmptyRelation`` eliminates CollectMetrics nodes
    when a stage turns out empty at runtime, and ``Observation.get`` then
    hangs forever / dies on a schemaless row (measured round 9) — for the
    dedup skew observations, empty is the COMMON case (no over-cap
    buckets) and also the catastrophic all-work-skipped case the signal
    exists to expose. ``get_session`` excludes the rule by default; every
    ``observe()`` call site MUST call this for foreign sessions too
    (round-10 ADVICE: two of the three skew sites lacked it).
    Append-merge, never clobbers a user's existing exclusions.
    """
    rule = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
    conf = spark.conf
    current = conf.get("spark.sql.adaptive.optimizer.excludedRules", None) or ""
    if rule not in current.split(","):
        conf.set(
            "spark.sql.adaptive.optimizer.excludedRules",
            f"{current},{rule}" if current else rule,
        )


def observed(
    df: DataFrame,
    name: str | None = None,
    extra_metrics: Sequence | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach scan metrics to a DataFrame; read ``observation.get`` after
    an action completes.

    Default metrics: row count + null-free row count of the first column.
    Additional aggregate expressions can be supplied.

    ``name`` defaults to an auto-generated UNIQUE name: two observations
    registered under the same name on one session make ``Observation.get``
    block FOREVER on whichever one the listener dropped — and the old
    fixed default ("scan_stats") collided with itself on the second
    ``observed()`` call of any session (round-9 executed probe, hung the
    probe harness). Pass an explicit name only if you guarantee it is
    unique for the session's lifetime; also never call ``.get`` when the
    action itself failed — the metrics never arrive and ``.get`` has no
    timeout.
    """
    obs = Observation(name) if name is not None else Observation()
    metrics = [F.count(F.lit(1)).alias("rows_read")]
    if df.columns:
        # a zero-column frame (all columns dropped) used to IndexError on
        # columns[0]; row count alone still observes (round-8 probe)
        metrics.append(F.count(F.col(df.columns[0])).alias("first_col_non_null"))
    if extra_metrics:
        metrics.extend(extra_metrics)
    return df.observe(obs, *metrics), obs


def observed_write_metrics(result) -> dict:
    """Normalize a bulk-writer WriteResult into the stats dictionary shape
    the reference reports per write session (rows/files/digest info)."""
    return {
        "rows_written": result.num_rows,
        "files_written": result.num_files,
        "batch_dir": result.batch_dir,
    }
