"""The bench weather guard must key on the REAL scale factor.

Round-8 review: the old parse (``re.search(r"sf([0-9.]+)")`` over the
full path) crashed on dotted scaled-dir names (``sf0.1.scale10`` →
``float("0.1.")``) and mis-adopted sf=0.1 for ``sf0.1_scale10`` — firing
the min-of-5 escalation against the sf0.1 record on a legitimately
slower 10x run. The parse now requires the basename to be exactly
``sf<float>``.
"""

from __future__ import annotations


def test_parse_sf_plain_dirs():
    from bench import _parse_sf

    assert _parse_sf("/root/testdata/sf0.1") == 0.1
    assert _parse_sf("/root/testdata/sf0.01/") == 0.01
    assert _parse_sf("sf1") == 1.0
    assert _parse_sf("/a/b/sf10") == 10.0


def test_parse_sf_scaled_dirs_do_not_adopt_an_sf():
    from bench import _parse_sf

    # dotted name: must not crash float()
    assert _parse_sf("/root/testdata/sf0.1.scale10") == -1.0
    # embedded sf substring: must not match the sf0.1 record
    assert _parse_sf("/root/testdata/sf0.1_scale10") == -1.0
    assert _parse_sf("/root/repo/.scale10") == -1.0
    assert _parse_sf("/root/repo/.scale100") == -1.0
    assert _parse_sf("/tmp/mydata") == -1.0


def test_prior_recorded_total_is_sf_scoped():
    """A -1.0 (non-sf dir) lookup finds no prior record, so the guard
    cannot escalate on scaled-corpus runs. Round 13: the lookup also
    returns the prior round's BYTE record (None until a bytes-carrying
    BENCH lands) so the guard can classify plan-vs-weather."""
    from bench import _prior_recorded

    total, b = _prior_recorded(-1.0)
    assert total is None and b is None
    # the repo carries sf0.1 records from prior rounds
    prior, prior_bytes = _prior_recorded(0.1)
    assert prior is None or prior > 0
    assert prior_bytes is None or isinstance(prior_bytes, dict)


def test_classify_bytes_plan_vs_weather():
    """The byte adjudicator: shuffle-write within 2% of the prior
    record = weather; bigger = plan; missing either side = None (never
    a guessed verdict)."""
    from bench import _classify_bytes

    prior = {"shuffle_write_bytes": 1_000_000}
    assert _classify_bytes({"shuffle_write_bytes": 1_010_000}, prior) == "weather"
    assert _classify_bytes({"shuffle_write_bytes": 1_050_000}, prior) == "plan"
    assert _classify_bytes({"shuffle_write_bytes": 900_000}, prior) == "plan"
    assert _classify_bytes(None, prior) is None
    assert _classify_bytes({"shuffle_write_bytes": 1}, None) is None
    assert _classify_bytes({"shuffle_write_bytes": 1},
                           {"shuffle_write_bytes": 0}) is None
