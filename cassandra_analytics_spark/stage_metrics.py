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

Snapshots carry a per-stageId breakdown (``__stages__``) so
:func:`delta` can diff PER STAGE instead of diffing cumulative totals:
the UI EVICTS old stages past ``spark.ui.retainedStages`` (default
1000), so late in a long app the "after" cumulative snapshot can lose
more history than the interval added and a cumulative diff goes
NEGATIVE (BENCH_r14 recorded input_records: -60354 for
dedup_ngram_jaccard at stage ~2244 — VERDICT r14). Per-stage diffing
only ever counts stages present in the AFTER snapshot: a stage new
since the before-snapshot contributes its full bytes, a stage present
in both contributes its (non-negative) growth, and an EVICTED stage —
which by definition completed before the interval — contributes
nothing, which is exactly its share of the interval.
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

_STAGES_KEY = "__stages__"


def _stage_field_maps(stages: list[dict]) -> dict[int, dict[str, int]]:
    """Per-stageId field maps over one StageData list. /stages lists one
    entry per stage ATTEMPT; summing attempts would double-count a
    retried stage's bytes and trip the bench plan-vs-weather classifier
    on weather (r13 ADVICE low). Aggregation is the per-field MAX
    across attempts (r14 ADVICE low): a re-attempt reruns only the
    MISSING partitions, so the latest attempt alone can UNDERCOUNT the
    stage — the max across attempts is the closest observable to the
    stage's full plan bytes (exact when any attempt ran all tasks,
    never less than the best single attempt otherwise)."""
    per: dict[int, dict[str, int]] = {}
    for s in stages:
        sid = int(s.get("stageId", -1))
        cur = per.setdefault(sid, {k: 0 for k in _FIELDS})
        for k, field in _FIELDS.items():
            cur[k] = max(cur[k], int(s.get(field, 0) or 0))
    return per


def _aggregate_stages(stages: list[dict]) -> dict[str, int]:
    """Sum the per-stage field maps over one StageData list (attempt
    handling per :func:`_stage_field_maps`)."""
    out = {k: 0 for k in _FIELDS}
    for fields in _stage_field_maps(stages).values():
        for k in _FIELDS:
            out[k] += fields[k]
    return out


def stage_totals(spark) -> dict | None:
    """Byte totals over every COMPLETED stage of this app so far, plus
    the per-stageId breakdown under ``__stages__`` — or None when the
    UI/REST endpoint is disabled. Snapshot before and after a workload
    and diff with :func:`delta` to attribute bytes to it."""
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
    per = _stage_field_maps(stages)
    out: dict = {k: 0 for k in _FIELDS}
    for fields in per.values():
        for k in _FIELDS:
            out[k] += fields[k]
    out[_STAGES_KEY] = per
    return out


def delta(before: dict | None, after: dict | None) -> dict[str, int] | None:
    """Byte attribution for the interval between two snapshots,
    None-propagating (either snapshot missing → None, never a
    fabricated zero).

    When both snapshots carry the per-stage breakdown, the diff is PER
    STAGEID: stages only in ``after`` count in full, stages in both
    count their (clamped non-negative) growth, and stages evicted from
    the UI between snapshots count zero — so the result can never go
    negative when the UI drops history (the BENCH_r14 negative-delta
    artifact). Plain field-dict snapshots (no breakdown) fall back to
    the cumulative field-wise diff."""
    if before is None or after is None:
        return None
    bs = before.get(_STAGES_KEY)
    as_ = after.get(_STAGES_KEY)
    if bs is not None and as_ is not None:
        out = {k: 0 for k in _FIELDS}
        for sid, fields in as_.items():
            prev = bs.get(sid)
            for k in _FIELDS:
                grown = fields.get(k, 0) - (prev.get(k, 0) if prev else 0)
                if grown > 0:
                    out[k] += grown
        return out
    return {k: after.get(k, 0) - before.get(k, 0) for k in _FIELDS}
