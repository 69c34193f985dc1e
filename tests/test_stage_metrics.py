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
