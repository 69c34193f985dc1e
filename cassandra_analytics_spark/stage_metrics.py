"""Aggregate stage byte-metrics from the Spark UI REST API.

Wall-clock on a shared box is weather-dominated (PERF.md documents an
18.8-28.2 s same-binary band at sf0.1; round 12 measured a 6% "win" on
byte-identical code), but BYTES are deterministic for a deterministic
plan: scan bytes move when pushdown/pruning regresses, shuffle bytes
move when a join strategy or partitioning changes. bench.py and the
measurement scripts record these alongside wall time so a plan
regression is distinguishable from weather.

Requires ``spark.ui.enabled=true`` (the repo session default is false —
pass ``extra_conf={"spark.ui.enabled": "true"}``); returns None when
the UI is off rather than guessing, so callers degrade loudly-visibly
(a missing ``bytes`` map in BENCH output) instead of recording zeros.
"""

from __future__ import annotations

import json
import urllib.request

# input_bytes CAVEAT (measured, round 13): with the vectorized parquet
# reader on a local filesystem, stage inputBytes under-reports (a
# 10.8 MB / 600k-row lineitem scan reports ~18 KB) while inputRecords
# is exact — so input_records is the reliable SCAN signal (a pushdown
# or pruning regression shows as more records scanned), and the shuffle
# byte counters are accurate (they come from the shuffle writers).
_FIELDS = {
    "input_bytes": "inputBytes",
    "input_records": "inputRecords",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "shuffle_read_bytes": "shuffleReadBytes",
    "output_bytes": "outputBytes",
}


def _aggregate_stages(stages: list[dict]) -> dict[str, int]:
    """Sum the byte fields over one StageData list. /stages lists one
    entry per stage ATTEMPT — a retried stage (task/fetch failure)
    would double-count its bytes and trip the bench plan-vs-weather
    classifier on weather, not plan (r13 ADVICE low) — so only the
    LATEST attempt of each stageId counts."""
    latest: dict[int, dict] = {}
    for s in stages:
        sid = int(s.get("stageId", -1))
        prev = latest.get(sid)
        if prev is None or int(s.get("attemptId", 0)) > int(
            prev.get("attemptId", 0)
        ):
            latest[sid] = s
    out = {k: 0 for k in _FIELDS}
    for s in latest.values():
        for k, field in _FIELDS.items():
            out[k] += int(s.get(field, 0) or 0)
    return out


def stage_totals(spark) -> dict[str, int] | None:
    """Cumulative byte totals over every COMPLETED stage of this app so
    far, or None when the UI/REST endpoint is disabled. Snapshot before
    and after a workload and diff with :func:`delta` to attribute bytes
    to it."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    return _aggregate_stages(stages)


def delta(before: dict[str, int] | None,
          after: dict[str, int] | None) -> dict[str, int] | None:
    """after - before, None-propagating (either snapshot missing →
    None, never a fabricated zero)."""
    if before is None or after is None:
        return None
    return {k: after.get(k, 0) - before.get(k, 0) for k in _FIELDS}
