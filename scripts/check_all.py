"""Local replica of the driver's correctness sweep: run every registered
query at a given SF dir against its DuckDB oracle (or rows-only) and print
one status line per query plus a failure summary.

Usage: python scripts/check_all.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded
from cassandra_analytics_spark.session import get_session
from cassandra_analytics_spark.testing import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    _ensure_loaded()
    spark = get_session()
    names = [
        n
        for n in REGISTRY
        if not filters or any(f in n for f in filters)
    ]
    failures: list[str] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            res = compare_query(name, spark, sf_dir)
            dt = time.time() - t0
            status = "OK  " if res.ok else "FAIL"
            kind = "rows" if REGISTRY[name].oracle is None else "orac"
            print(f"{status} {kind} {dt:6.2f}s {name} ({res.spark_rows} rows)", flush=True)
            if not res.ok:
                failures.append(str(res))
        except Exception as exc:  # noqa: BLE001
            dt = time.time() - t0
            print(f"ERR       {dt:6.2f}s {name}: {exc}", flush=True)
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok in {time.time() - t_all:.1f}s")
    for f in failures:
        print("-" * 60)
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
