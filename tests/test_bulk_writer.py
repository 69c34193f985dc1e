"""Bulk writer (W1-W4, S4/S5) round-trip: write → commit → read-merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from cassandra_analytics_spark.schema import parse_create_table
from cassandra_analytics_spark.sinks.bulk_writer import (
    BulkWriteError,
    WriteMode,
    bulk_write,
    committed_batches,
    read_bulk_table,
    verify_digests,
)


def _rows(spark, data):
    return spark.createDataFrame([Row(**d) for d in data])


def test_roundtrip_upsert_lww(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = _rows(spark, [
        {"id": 1, "ck": 1, "val": "one"},
        {"id": 2, "ck": 1, "val": "two"},
    ])
    r1 = bulk_write(v1, path, ["id"], ["ck"], write_timestamp_micros=1_000)
    assert r1.num_rows == 2 and os.path.exists(r1.manifest_path)

    v2 = _rows(spark, [{"id": 2, "ck": 1, "val": "two-updated"}])
    bulk_write(v2, path, ["id"], ["ck"], write_timestamp_micros=2_000)

    out = read_bulk_table(spark, path, ["id"], ["ck"])
    got = {(r.id, r.ck): r.val for r in out.collect()}
    assert got == {(1, 1): "one", (2, 1): "two-updated"}
    assert len(committed_batches(path)) == 2


def test_delete_partition_mode(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [
        {"id": 1, "ck": 1, "val": "a"},
        {"id": 1, "ck": 2, "val": "b"},
        {"id": 2, "ck": 1, "val": "c"},
    ])
    bulk_write(data, path, ["id"], ["ck"], write_timestamp_micros=1_000)
    deletes = spark.createDataFrame([Row(id=1)])
    bulk_write(
        deletes, path, ["id"], ["ck"],
        mode=WriteMode.DELETE_PARTITION, write_timestamp_micros=2_000,
    )
    out = read_bulk_table(spark, path, ["id"], ["ck"])
    got = {(r.id, r.ck): r.val for r in out.collect()}
    assert got == {(2, 1): "c"}


def test_digest_manifest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": i, "ck": 0, "val": f"v{i}"} for i in range(100)])
    result = bulk_write(data, path, ["id"], ["ck"], write_timestamp_micros=1)
    assert result.num_files >= 1
    assert verify_digests(result.batch_dir)
    # corrupt one file → digest check fails (disk-corruption test analog)
    files = [f for f in os.listdir(result.batch_dir) if f.endswith(".parquet")]
    with open(os.path.join(result.batch_dir, files[0]), "ab") as f:
        f.write(b"CORRUPT")
    assert not verify_digests(result.batch_dir)


def test_validation_missing_pk(spark, tmp_path):
    df = _rows(spark, [{"a": 1, "b": 2}])
    with pytest.raises(BulkWriteError, match="missing primary-key"):
        bulk_write(df, str(tmp_path / "t"), ["nope"])


def test_validation_extra_column_vs_table(spark, tmp_path):
    table = parse_create_table(
        "CREATE TABLE ks.t (id bigint PRIMARY KEY, course blob, marks bigint);"
    )
    df = _rows(spark, [{"id": 1, "marks": 10, "surprise": "x"}])
    with pytest.raises(BulkWriteError, match="not in table schema"):
        bulk_write(df, str(tmp_path / "t"), ["id"], table=table)


def test_overwrite_rejected(spark, tmp_path):
    df = _rows(spark, [{"id": 1}])
    with pytest.raises(BulkWriteError, match="append-only"):
        bulk_write(df, str(tmp_path / "t"), ["id"], save_mode="overwrite")


def test_ttl_expiry_on_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": 1, "val": "ephemeral"}])
    # writetime 1970 + 1s TTL → long expired
    bulk_write(data, path, ["id"], write_timestamp_micros=1_000_000, ttl_seconds=1)
    out = read_bulk_table(spark, path, ["id"])
    assert out.count() == 0


def test_sorted_within_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    data = _rows(spark, [{"id": i, "ck": i % 3, "val": str(i)} for i in range(500)])
    bulk_write(
        data, path, ["id"], ["ck"], write_timestamp_micros=1, num_partitions=4
    )
    batch = committed_batches(path)[0]
    import pyarrow.parquet as pq

    from cassandra_analytics_spark.functions.tokens import MIN_TOKEN
    for fname in os.listdir(batch):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(batch, fname))
        ids = tbl.column("id").to_pylist()
        # files are sorted by token; recompute tokens and check monotonicity
        import pyspark.sql.functions as F
        df = spark.createDataFrame([Row(id=i) for i in ids])
        toks = [
            r.t
            for r in df.coalesce(1).select(F.xxhash64("id").alias("t")).collect()
        ]
        assert toks == sorted(toks), f"file {fname} not token-sorted"


# ---------------------------------------------------------------------------
# Coordinated multi-target write (CassandraCoordinatedBulkWriterContext /
# CoordinatedWriteConf analog): one DataFrame, several table paths, one
# all-or-nothing joint commit.
# ---------------------------------------------------------------------------

from cassandra_analytics_spark.sinks.bulk_writer import coordinated_bulk_write


def _no_trace(path):
    """True when a target dir holds neither committed batches nor staging
    leftovers."""
    if not os.path.isdir(path):
        return True
    return not [d for d in os.listdir(path)
                if d.startswith(("batch-", "_staging-"))]


def test_coordinated_write_two_targets_roundtrip(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    src = _rows(spark, [{"id": i, "ck": i % 3, "val": f"v{i}"} for i in range(120)])
    results = coordinated_bulk_write(
        src, [a, b], ["id"], ["ck"], write_timestamp_micros=1_000,
        num_partitions=4,
    )
    assert len(results) == 2
    assert all(r.num_rows == 120 for r in results)
    # both targets share the batch id and hold byte-identical file sets
    assert os.path.basename(results[0].batch_dir) == os.path.basename(
        results[1].batch_dir
    )
    want = {(r.id, r.ck): r.val for r in src.collect()}
    for t in (a, b):
        assert len(committed_batches(t)) == 1
        assert verify_digests(committed_batches(t)[0])
        back = read_bulk_table(spark, t, ["id"], ["ck"])
        assert {(r.id, r.ck): r.val for r in back.collect()} == want


def test_coordinated_write_rejects_duplicate_targets(spark, tmp_path):
    src = _rows(spark, [{"id": 1, "val": "x"}])
    t = str(tmp_path / "t")
    with pytest.raises(BulkWriteError, match="duplicate"):
        coordinated_bulk_write(src, [t, t], ["id"])


def test_coordinated_write_rejects_key_mismatch_target(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    seed = _rows(spark, [{"id": 1, "ck": 2, "val": "x"}])
    bulk_write(seed, b, ["id"], ["ck"], write_timestamp_micros=1)
    src = _rows(spark, [{"id": 1, "val": "x"}])
    with pytest.raises(BulkWriteError, match="agree on the primary key"):
        coordinated_bulk_write(src, [a, b], ["id"], write_timestamp_micros=2)
    # nothing was staged or committed into the clean target
    assert _no_trace(a)


def test_coordinated_write_staging_failure_publishes_nothing(spark, tmp_path):
    """Replication into target B fails (target path is a regular file, so
    its staging dir can't be created) → neither target commits, no
    staging leftovers anywhere."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    open(b, "w").write("not a directory")
    src = _rows(spark, [{"id": i, "val": f"v{i}"} for i in range(50)])
    with pytest.raises(OSError):
        coordinated_bulk_write(src, [a, b], ["id"], write_timestamp_micros=1_000)
    assert _no_trace(a)
    assert os.path.isfile(b)  # untouched


def test_coordinated_write_commit_failure_rolls_back(spark, tmp_path, monkeypatch):
    """A rename failure mid-joint-commit (environmental) must roll back
    the already-published target — no partial publish survives."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    src = _rows(spark, [{"id": i, "val": f"v{i}"} for i in range(50)])

    real_rename = os.rename

    def flaky_rename(srcp, dstp):
        # fail only when publishing target b's final batch dir
        if dstp.startswith(b) and "/batch-" in dstp and "_staging-" not in dstp:
            raise OSError("injected commit failure")
        return real_rename(srcp, dstp)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(OSError, match="injected"):
        coordinated_bulk_write(src, [a, b], ["id"], write_timestamp_micros=1_000)
    monkeypatch.undo()
    assert _no_trace(a) and _no_trace(b)


def test_coordinated_write_rollback_failure_is_reported(
    spark, tmp_path, monkeypatch
):
    """If the joint commit fails AND the rename-back of an
    already-published target also fails (double environmental fault),
    the raised error must name the targets left published instead of
    silently pretending the rollback succeeded (ADVICE r4)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    src = _rows(spark, [{"id": i, "val": f"v{i}"} for i in range(50)])

    real_rename = os.rename

    def flaky_rename(srcp, dstp):
        # commit of b's final dir fails, then a's rename-back fails too
        if dstp.startswith(b) and "/batch-" in dstp and "_staging-" not in dstp:
            raise OSError("injected commit failure")
        if dstp.startswith(a) and "_staging-" in dstp:
            raise OSError("injected rollback failure")
        return real_rename(srcp, dstp)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(BulkWriteError, match="partial publish"):
        coordinated_bulk_write(src, [a, b], ["id"], write_timestamp_micros=1_000)
    monkeypatch.undo()
    # target a really was left published — the error told the truth
    assert len(committed_batches(a)) == 1
    assert committed_batches(b) == []


def test_coordinated_write_cl_gate_tolerates_within_cl(spark, tmp_path):
    """The write-CL gate (BulkWriteValidator.validateClOrFail analog):
    per-target placement failures are tolerated exactly as far as the
    requested consistency allows — QUORUM at rf=3 commits the two
    surviving targets; ALL refuses and publishes NOTHING; two failures
    break QUORUM too."""
    src = _rows(spark, [{"id": i, "val": f"v{i}"} for i in range(50)])

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    bad = str(tmp_path / "blocker")
    open(bad, "w").write("not a directory")
    results = coordinated_bulk_write(
        src, [a, b, bad], ["id"], write_timestamp_micros=1_000,
        consistency="QUORUM", rf=3,
    )
    assert len(results) == 2  # the COMMITTED targets only
    for t in (a, b):
        assert len(committed_batches(t)) == 1
        assert verify_digests(committed_batches(t)[0])
        back = read_bulk_table(spark, t, ["id"])
        assert back.count() == 50
    assert os.path.isfile(bad)  # untouched

    # the same single failure breaks ALL: refused, nothing published
    a2, b2 = str(tmp_path / "a2"), str(tmp_path / "b2")
    bad2 = str(tmp_path / "blocker2")
    open(bad2, "w").write("x")
    with pytest.raises(BulkWriteError, match="refusing to commit"):
        coordinated_bulk_write(
            src, [a2, b2, bad2], ["id"], write_timestamp_micros=1_000,
            consistency="ALL", rf=3,
        )
    assert _no_trace(a2) and _no_trace(b2)

    # two failures out of three break QUORUM as well
    a3 = str(tmp_path / "a3")
    bad3, bad4 = str(tmp_path / "b3"), str(tmp_path / "b4")
    open(bad3, "w").write("x")
    open(bad4, "w").write("x")
    with pytest.raises(BulkWriteError, match="refusing to commit"):
        coordinated_bulk_write(
            src, [a3, bad3, bad4], ["id"], write_timestamp_micros=1_000,
            consistency="QUORUM", rf=3,
        )
    assert _no_trace(a3)


def test_coordinated_write_cl_gate_multi_dc_and_pending(spark, tmp_path):
    """Per-DC CL math rides the gate: EACH_QUORUM tolerates one failure
    per DC at rf=3, and a pending instance inflates that DC's bar
    (Cassandra's blockForWrite) so the same failure then refuses."""
    src = _rows(spark, [{"id": i, "val": f"v{i}"} for i in range(30)])
    rf = {"dc1": 3, "dc2": 3}

    a1, a2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    bad = str(tmp_path / "bad")
    open(bad, "w").write("x")
    targets = [a1, a2, b1, b2, bad]
    dcs = ["dc1", "dc1", "dc2", "dc2", "dc2"]
    results = coordinated_bulk_write(
        src, targets, ["id"], write_timestamp_micros=1_000,
        consistency="EACH_QUORUM", rf=rf, target_dcs=dcs,
    )
    assert len(results) == 4
    for t in (a1, a2, b1, b2):
        assert len(committed_batches(t)) == 1

    # a dc2 pending instance raises dc2's bar from 2 to 3 — the same
    # shape now refuses (only 2 dc2 targets can succeed)
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    bad2 = str(tmp_path / "bad2")
    open(bad2, "w").write("x")
    with pytest.raises(BulkWriteError, match="refusing to commit"):
        coordinated_bulk_write(
            src, [c1, c2, d1, d2, bad2], ["id"],
            write_timestamp_micros=1_000,
            consistency="EACH_QUORUM", rf=rf, target_dcs=dcs[:4] + ["dc2"],
            pending_dcs=["dc2"],
        )
    for t in (c1, c2, d1, d2):
        assert _no_trace(t)


def test_coordinated_write_cl_gate_validation(spark, tmp_path):
    """Gate parameter coherence: consistency needs rf; a per-DC map
    needs target_dcs; gate args without consistency are refused; an ask
    the full target set cannot satisfy is refused BEFORE any work."""
    src = _rows(spark, [{"id": 1, "val": "x"}])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    with pytest.raises(BulkWriteError, match="needs rf="):
        coordinated_bulk_write(src, [a, b], ["id"], consistency="QUORUM")
    with pytest.raises(BulkWriteError, match="needs target_dcs"):
        coordinated_bulk_write(
            src, [a, b], ["id"], consistency="QUORUM", rf={"dc1": 3}
        )
    with pytest.raises(BulkWriteError, match="parallel sequences"):
        coordinated_bulk_write(
            src, [a, b], ["id"], consistency="QUORUM",
            rf={"dc1": 3}, target_dcs=["dc1"],
        )
    with pytest.raises(BulkWriteError, match="only meaningful with"):
        coordinated_bulk_write(src, [a, b], ["id"], rf=3)
    # ALL at rf=3 with only two targets can never be satisfied
    with pytest.raises(BulkWriteError, match="impossible configuration"):
        coordinated_bulk_write(
            src, [a, b], ["id"], write_timestamp_micros=1_000,
            consistency="ALL", rf=3,
        )
    assert _no_trace(a) and _no_trace(b)  # refused before any work


def test_validation_enforces_table_clustering_keys_on_append(spark, tmp_path):
    """An APPEND write against a table whose DDL declares clustering keys
    must carry them even when the caller passes clustering_keys=() — the
    pk-only relaxation exists solely for DELETE_PARTITION batches."""
    table = parse_create_table(
        "CREATE TABLE ks.t (id bigint, ck int, v text, PRIMARY KEY (id, ck));"
    )
    df = _rows(spark, [{"id": 1, "v": "x"}])  # no ck column
    with pytest.raises(BulkWriteError, match="key column missing"):
        bulk_write(df, str(tmp_path / "t"), ["id"], table=table)
    # the same pk-only shape is legal as a partition delete
    bulk_write(
        _rows(spark, [{"id": 1}]), str(tmp_path / "t2"), ["id"],
        mode=WriteMode.DELETE_PARTITION, table=table,
    )


def test_verify_digests_flags_missing_and_extra_files(spark, tmp_path):
    path = str(tmp_path / "t")
    result = bulk_write(_rows(spark, [{"id": i} for i in range(10)]), path, ["id"])
    assert verify_digests(result.batch_dir)

    # extra unmanifested parquet: readers would glob it in — must flag
    stray = os.path.join(result.batch_dir, "stray.parquet")
    some = next(
        f for f in os.listdir(result.batch_dir) if f.endswith(".parquet")
    )
    import shutil

    shutil.copyfile(os.path.join(result.batch_dir, some), stray)
    assert not verify_digests(result.batch_dir)
    os.remove(stray)
    assert verify_digests(result.batch_dir)

    # manifest-listed file missing: report False, don't crash
    os.remove(os.path.join(result.batch_dir, some))
    assert not verify_digests(result.batch_dir)


def test_per_row_writetime_type_is_normalized(spark, tmp_path):
    """A caller-supplied int-typed writetime column must not poison the
    table: later batches stamp long writetimes and a mixed table would
    fail mergeSchema reads."""
    path = str(tmp_path / "t")
    with_wt = spark.createDataFrame(
        [(1, "a", 100)], "id int, v string, writetime int"
    )
    bulk_write(with_wt, path, ["id"])
    bulk_write(
        spark.createDataFrame([(2, "b")], "id int, v string"), path, ["id"],
        write_timestamp_micros=200,
    )
    rows = {r.id: r.v for r in read_bulk_table(spark, path, ["id"]).collect()}
    assert rows == {1: "a", 2: "b"}


def test_unwrap_task_error_sentinel_contract():
    """Driver-side unwrap keys on sentinels WE control, not on how PySpark
    formats remote tracebacks (ADVICE r5)."""
    from cassandra_analytics_spark.sinks.bulk_writer import (
        TASK_ERROR_END,
        TASK_ERROR_MARK,
        BulkWriteError,
        unwrap_task_error,
    )

    wrapped = RuntimeError(
        f"Job aborted...\n{TASK_ERROR_MARK}bundle digest mismatch: b-0.zip"
        f"{TASK_ERROR_END}\n  at org.apache..."
    )
    e = unwrap_task_error(wrapped)
    assert isinstance(e, BulkWriteError)
    assert str(e) == "bundle digest mismatch: b-0.zip"

    # no sentinel → not ours, caller re-raises the raw failure
    assert unwrap_task_error(RuntimeError("BulkWriteError: impostor")) is None

    # truncated embedding (no end marker) → best-effort keeps the WHOLE
    # multi-line remainder up to the 4 KiB cap, not just the first line
    # (ADVICE r6: a multi-line validation message was silently cut)
    e2 = unwrap_task_error(RuntimeError(f"{TASK_ERROR_MARK}partial msg\ntail"))
    assert str(e2) == "partial msg\ntail"
    e3 = unwrap_task_error(RuntimeError(TASK_ERROR_MARK + "x" * 10_000))
    assert len(str(e3)) == 4096


def test_ttl_zero_means_forever_on_jvm_path(spark, tmp_path):
    """TTL 0 = no expiry (TTLOption.java FOREVER), for both the constant
    option and per-row TTL column values — a stored literal 0 would mean
    instant expiry under the merge's writetime+ttl<=now rule."""
    path = str(tmp_path / "t")
    bulk_write(
        spark.createDataFrame([(1, "const-forever")], "id int, v string"),
        path, ["id"], write_timestamp_micros=100, ttl_seconds=0,
    )
    bulk_write(
        spark.createDataFrame(
            [(2, "row-forever", 0), (3, "row-expired", 1)],
            "id int, v string, ttl int",
        ),
        path, ["id"], write_timestamp_micros=100,
    )
    rows = {r.id: r.v for r in read_bulk_table(spark, path, ["id"]).collect()}
    assert rows == {1: "const-forever", 2: "row-forever"}  # id=3 expired
