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
