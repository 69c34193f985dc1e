"""UI REST byte-metric helpers (stage_metrics.py) — the plan-vs-weather
adjudication record bench.py carries from round 13."""

from __future__ import annotations

from cassandra_analytics_spark.stage_metrics import delta, stage_totals


def test_delta_is_none_propagating_and_fieldwise():
    a = {"input_bytes": 10, "input_records": 100,
         "shuffle_write_bytes": 5, "shuffle_read_bytes": 5,
         "output_bytes": 0}
    b = {"input_bytes": 25, "input_records": 300,
         "shuffle_write_bytes": 9, "shuffle_read_bytes": 7,
         "output_bytes": 3}
    assert delta(a, b) == {"input_bytes": 15, "input_records": 200,
                           "shuffle_write_bytes": 4,
                           "shuffle_read_bytes": 2, "output_bytes": 3}
    # a missing snapshot must yield None, never a fabricated zero
    assert delta(None, b) is None
    assert delta(a, None) is None


def test_stage_totals_none_when_ui_disabled(spark):
    # the repo session default disables the UI — the helper must say
    # "no data" rather than guessing
    assert spark.sparkContext.uiWebUrl is None or isinstance(
        stage_totals(spark), dict
    )
    if spark.sparkContext.uiWebUrl is None:
        assert stage_totals(spark) is None


def test_aggregate_stages_dedupes_attempts():
    """r13 ADVICE low: /stages lists one StageData per ATTEMPT — a
    retried stage must count once (latest attempt), or a run with a
    task/fetch-failure retry double-counts bytes and the bench's 2%
    plan-vs-weather classifier misfires on weather."""
    from cassandra_analytics_spark.stage_metrics import _aggregate_stages

    stages = [
        {"stageId": 1, "attemptId": 0, "shuffleWriteBytes": 100,
         "inputBytes": 10, "inputRecords": 5, "shuffleReadBytes": 100,
         "outputBytes": 0},
        # retry of stage 1: only THIS attempt's bytes may count
        {"stageId": 1, "attemptId": 1, "shuffleWriteBytes": 120,
         "inputBytes": 12, "inputRecords": 6, "shuffleReadBytes": 120,
         "outputBytes": 0},
        {"stageId": 2, "attemptId": 0, "shuffleWriteBytes": 7,
         "inputBytes": 1, "inputRecords": 1, "shuffleReadBytes": 7,
         "outputBytes": 3},
    ]
    got = _aggregate_stages(stages)
    assert got["shuffle_write_bytes"] == 127  # 120 + 7, NOT 227
    assert got["input_bytes"] == 13
    assert got["output_bytes"] == 3
    # attempt order must not matter
    assert _aggregate_stages(list(reversed(stages))) == got
    # missing fields tolerated (None/absent -> 0)
    assert _aggregate_stages([{"stageId": 9, "attemptId": 0}])[
        "input_bytes"
    ] == 0


def test_delta_per_stage_never_negative_under_eviction():
    """VERDICT r14: the UI evicts old stages past spark.ui.retainedStages,
    so a CUMULATIVE diff late in a long app can lose more history than
    the interval added and go negative (BENCH_r14 recorded
    input_records: -60354). The per-stage diff must attribute only the
    stages present in the AFTER snapshot."""
    from cassandra_analytics_spark.stage_metrics import _STAGES_KEY, delta

    def snap(stages):
        out = {"input_bytes": 0, "input_records": 0,
               "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
               "output_bytes": 0, _STAGES_KEY: stages}
        for f in stages.values():
            for k in out:
                if k != _STAGES_KEY:
                    out[k] += f.get(k, 0)
        return out

    row = lambda recs: {"input_bytes": 0, "input_records": recs,
                        "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
                        "output_bytes": 0}
    # before: stages 1..3 complete (300 records of history)
    before = snap({1: row(100), 2: row(100), 3: row(100)})
    # after: the UI evicted stages 1-2, the interval added stage 4 (40)
    after = snap({3: row(100), 4: row(40)})
    d = delta(before, after)
    assert d is not None
    assert d["input_records"] == 40  # NOT 140 - 300 = -160
    assert all(v >= 0 for v in d.values())
    # a stage present in both snapshots counts only its growth
    grown = snap({3: row(130), 4: row(40)})
    assert delta(before, grown)["input_records"] == 70


def test_aggregate_stages_takes_max_across_attempts():
    """r14 ADVICE low: a stage re-attempt reruns only the MISSING
    partitions, so the latest attempt alone can UNDERCOUNT — the
    per-field max across attempts is the closest observable to the
    stage's full plan bytes."""
    from cassandra_analytics_spark.stage_metrics import _aggregate_stages

    stages = [
        # attempt 0 ran all tasks (full bytes), attempt 1 only reran a
        # missing subset — the stage must count 100, not 30
        {"stageId": 5, "attemptId": 0, "shuffleWriteBytes": 100,
         "inputRecords": 50},
        {"stageId": 5, "attemptId": 1, "shuffleWriteBytes": 30,
         "inputRecords": 10},
    ]
    got = _aggregate_stages(stages)
    assert got["shuffle_write_bytes"] == 100
    assert got["input_records"] == 50
