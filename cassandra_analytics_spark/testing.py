"""Oracle-comparison harness mirroring the driver's correctness gate.

Runs a registered query through Spark and its oracle SQL through DuckDB
over the same parquet tables, then compares row count, column names, and
values (order-insensitive, exact — floats must match bit-for-bit, which the
decimal-sum convention guarantees).
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from cassandra_analytics_spark.catalog import TABLES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, datetimes tz-naive ns,
    rows sorted by all columns."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[ns]")
        elif s.dtype == object:
            # dates come back as datetime.date from one engine, Timestamp
            # from another; convert datetime-likes to one type BEFORE
            # stringifying (str(date) = '1997-01-01' but str(Timestamp) =
            # '1997-01-01 00:00:00' — raw str() would mismatch equal values)
            def _canon(v):
                if v is None:
                    return None
                if isinstance(v, (datetime.date, datetime.datetime)):
                    return str(pd.Timestamp(v))
                return str(v)

            out[c] = s.map(_canon)
    sort_cols = list(out.columns)
    out = out.sort_values(by=sort_cols, na_position="first").reset_index(drop=True)
    return out


def _cells_equal(a: object, b: object) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare_query(name: str, spark, sf_dir: str) -> CompareResult:
    from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return CompareResult(name=name, ok=True, spark_rows=len(sdf), oracle_rows=-1,
                             mismatches=["rows-only check (no oracle)"])
    con = duckdb_connection(sf_dir)
    odf = con.execute(q.oracle).df()

    mismatches: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        mismatches.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return CompareResult(name, False, len(sdf), len(odf), mismatches)
    if len(sdf) != len(odf):
        mismatches.append("row counts differ")
        return CompareResult(name, False, len(sdf), len(odf), mismatches)

    a = _normalize(sdf)
    b = _normalize(odf)
    for col in a.columns:
        # The driver's value-hash is TYPE-sensitive (a DuckDB HUGEINT sum
        # poisons the hash even when every value equals the Spark bigint).
        # Mirror that: post-normalization dtypes must agree exactly.
        if str(a[col].dtype) != str(b[col].dtype):
            mismatches.append(
                f"col {col}: dtype differs: spark={a[col].dtype} oracle={b[col].dtype}"
            )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not _cells_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            mismatches.append(
                f"col {col}: {len(bad)}/{len(av)} cells differ; first at row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return CompareResult(name, not mismatches, len(sdf), len(odf), mismatches)
