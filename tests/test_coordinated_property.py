"""Property-based all-or-nothing guarantee for the coordinated writers
(both transports).

The example-based failure-injection tests in test_bulk_writer.py /
test_bundles.py pin specific fault points; these properties sweep the
whole (target count, commit-failure point) grid the joint-commit
protocol must survive — the analog of the reference's
CoordinatedWriteConf multi-cluster contract
(bulkwriter/coordinatedwrite/CassandraCoordinatedBulkWriterContext.java):
after any single commit-phase fault, either EVERY target exposes the
batch or NONE does.

Fault model: the k-th publish rename (staging -> final dir) raises
OSError. Rollback renames are left healthy, so the protocol is expected
to fully unpublish — the double-fault (rollback also failing) case is
covered by the example test, which asserts the partial-publish report.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_analytics_spark.sinks.bulk_writer import (
    committed_batches,
    coordinated_bulk_write,
    read_bulk_table,
)
from cassandra_analytics_spark.sinks.bundles import (
    coordinated_bundle_write,
    restore_bundles,
    store_jobs,
)

# (n_targets, fail_at): fail_at == n_targets means no fault is injected.
scenario = st.integers(min_value=1, max_value=3).flatmap(
    lambda n: st.tuples(st.just(n), st.integers(min_value=0, max_value=n))
)


class _FailNthPublish:
    """Patch os.rename so the fail_at-th rename whose destination
    basename matches ``prefix`` (a final publish dir — staging dirs are
    '_staging-…' so they never match) raises OSError."""

    def __init__(self, prefix: str, fail_at: int):
        self.prefix = prefix
        self.fail_at = fail_at
        self.seen = 0
        self.real = os.rename

    def __enter__(self):
        def fake(src, dst):
            if os.path.basename(dst).startswith(self.prefix):
                if self.seen == self.fail_at:
                    raise OSError(f"injected commit failure #{self.seen}")
                self.seen += 1
            return self.real(src, dst)

        os.rename = fake
        return self

    def __exit__(self, *exc):
        os.rename = self.real


def _mkdirs(tmp_path_factory, n: int) -> list[str]:
    base = tmp_path_factory.mktemp("coord_prop")
    return [str(base / f"t{i}") for i in range(n)]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario)
def test_coordinated_bulk_write_all_or_nothing(spark, tmp_path_factory, sc):
    n_targets, fail_at = sc
    targets = _mkdirs(tmp_path_factory, n_targets)
    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, val string"
    )
    inject = fail_at < n_targets
    with _FailNthPublish("batch-", fail_at):
        if inject:
            with pytest.raises(OSError, match="injected commit failure"):
                coordinated_bulk_write(
                    src, targets, ["id"], write_timestamp_micros=1_000,
                    num_partitions=1,
                )
        else:
            coordinated_bulk_write(
                src, targets, ["id"], write_timestamp_micros=1_000,
                num_partitions=1,
            )

    counts = [len(committed_batches(t)) for t in targets]
    if inject:
        assert counts == [0] * n_targets  # nothing published anywhere
        # no staging residue either
        for t in targets:
            leftovers = os.listdir(t) if os.path.isdir(t) else []
            assert not [d for d in leftovers if d.startswith("_staging-")]
    else:
        assert counts == [1] * n_targets
        want = {(i, f"v{i}") for i in range(20)}
        for t in targets:
            got = {
                (r.id, r.val)
                for r in read_bulk_table(spark, t, ["id"]).collect()
            }
            assert got == want


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario)
def test_coordinated_bundle_write_all_or_nothing(spark, tmp_path_factory, sc):
    n_stores, fail_at = sc
    stores = _mkdirs(tmp_path_factory, n_stores)
    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, val string"
    )
    inject = fail_at < n_stores
    with _FailNthPublish("job-", fail_at):
        if inject:
            with pytest.raises(OSError, match="injected commit failure"):
                coordinated_bundle_write(
                    src, stores, ["id"], write_timestamp_micros=1_000,
                    num_partitions=1,
                )
        else:
            coordinated_bundle_write(
                src, stores, ["id"], write_timestamp_micros=1_000,
                num_partitions=1,
            )

    counts = [len(store_jobs(s)) for s in stores]
    if inject:
        assert counts == [0] * n_stores
        for s in stores:
            leftovers = os.listdir(s) if os.path.isdir(s) else []
            assert not [d for d in leftovers if d.startswith("_staging-")]
    else:
        assert counts == [1] * n_stores
        # stores hold byte-identical bundle sets (replication is
        # digest-verified; compare cheaply here) and the job restores
        with open(
            os.path.join(store_jobs(stores[0])[0], "_bundle_manifest.json"), "rb"
        ) as f:
            first_manifest = f.read()
        for s in stores[1:]:
            with open(
                os.path.join(store_jobs(s)[0], "_bundle_manifest.json"), "rb"
            ) as f:
                assert f.read() == first_manifest
        tbl = str(tmp_path_factory.mktemp("restore") / "tbl")
        restore_bundles(spark, store_jobs(stores[0])[0], tbl)
        got = {
            (r.id, r.val)
            for r in read_bulk_table(spark, tbl, ["id"]).collect()
        }
        assert got == {(i, f"v{i}") for i in range(20)}
