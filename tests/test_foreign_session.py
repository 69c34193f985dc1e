"""The driver builds its OWN SparkSession (no engine defaults). Lock in
that the entry contract works under a vanilla session in a fresh process:
no reliance on session-factory configs (nanosAsLong, AQE, tz) that the
driver might not set."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import importlib, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-sim")
    .getOrCreate()
)
mod = importlib.import_module("__spark_entry__")
rows = mod.entry(spark).collect()
assert len(rows) > 0, "entry returned no rows"

qs = mod.queries()
sqls = mod.oracle_sql()
assert set(sqls) <= set(qs), "oracle_sql keys not subset of queries"

# session-sensitive paths: nanos timestamps + window over events, plus
# the round-2 classes that do real side work under the driver's session —
# streaming (file source, state store, memory sink), the bulk-write
# round-trip (temp-dir write + committed-batch read), and the per-cell
# LWW aggregation
for name in (
    "events_hourly_stats",
    "lww_latest_events",
    "q1_pricing_summary",
    "lww_partial_upsert",
    "bulk_write_roundtrip",
    "streaming_hourly_stats",
):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
print("FOREIGN_SESSION_OK")
"""


def test_entry_contract_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FOREIGN_SESSION_OK" in proc.stdout
