"""Evidence-staleness as a RED TEST instead of a judge finding
(round 14, VERDICT r13 item 8).

The round driver verifies the first ~50 registry entries per round, so
every query's "newest driver row" ages unless the rotation
(`queries._ROUND_PRIORITY`) cycles it back into the window. Rounds 8-13
kept that discipline by hand; this test automates it: for every
registered query, EITHER its newest CORRECTNESS_r*.json row is at most
4 rounds older than the newest committed round, OR the query is
scheduled in the UPCOMING window (the first 50 of the registration
order the driver will verify next) — which is also the only legitimate
state for a never-driver-proved query (new registrations lead the next
rotation, the r13->r14 hand-off contract).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50          # driver verifies the first ~50 registry entries
MAX_STALE = 4        # a row older than this many rounds must re-rotate


def _newest_rows() -> tuple[int, dict[str, int]]:
    newest: dict[str, int] = {}
    max_round = 0
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        max_round = max(max_round, rnd)
        for name in data:
            newest[name] = max(newest.get(name, 0), rnd)
    return max_round, newest


def test_no_registered_query_evidence_is_stale():
    from cassandra_analytics_spark.queries import queries

    max_round, newest = _newest_rows()
    assert max_round >= 13  # the repo carries the round history
    ordered = list(queries())
    upcoming = set(ordered[:WINDOW])
    stale = []
    for name in ordered:
        latest = newest.get(name)
        fresh = latest is not None and latest >= max_round - MAX_STALE
        if not fresh and name not in upcoming:
            stale.append((name, latest))
    assert not stale, (
        f"queries with driver evidence older than {MAX_STALE} rounds "
        f"(vs r{max_round}) and NOT scheduled in the upcoming "
        f"{WINDOW}-row window — rotate _ROUND_PRIORITY: {stale}"
    )


def test_never_proved_queries_lead_the_window():
    """A query with NO driver row ever (newly registered) must sit in
    the upcoming window — registering past the window and not rotating
    it forward is how ann_pq_index_topk/ann_ivf_pq_topk went two rounds
    unproved (VERDICT r13 item 1)."""
    from cassandra_analytics_spark.queries import queries

    _, newest = _newest_rows()
    ordered = list(queries())
    unproved = [n for n in ordered if n not in newest]
    outside = [n for n in unproved if n not in set(ordered[:WINDOW])]
    assert not outside, (
        f"never-driver-proved queries registered outside the upcoming "
        f"{WINDOW}-row window: {outside}"
    )
