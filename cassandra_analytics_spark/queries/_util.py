"""Shared helpers for oracle-exact numeric determinism.

Floating-point sums are order-sensitive; Spark and DuckDB aggregate in
different orders, so raw ``SUM(double)`` can differ in the low bits and
break a value-hash comparison. Convention used by every query here:

* cast each addend to a fixed DECIMAL before summing (exact, associative),
* cast the final aggregate back to DOUBLE,
* express the oracle SQL with the *same* casts.

Per-row double arithmetic (products, sqrt) is IEEE-deterministic and safe;
only the reduction order needs the decimal detour.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"  # plenty of headroom for sf0.1..sf100 sums
DEC_SQL = "DECIMAL(28,6)"


def dsum(c: Column) -> Column:
    """Deterministic double sum: decimal-sum then cast to double."""
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def davg(c: Column) -> Column:
    """Deterministic double avg: exact decimal sum / non-null count."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"
