"""Concurrent-reader soak over compact/restore commits (VERDICT r7
item 3): readers loop read_bulk_table (merged) and as_of_batch snapshot
reads while a writer thread commits upsert batches, runs major
compactions, and restores a stale bundle job into the same table.

The commit contract under test: the new batch commits (atomic rename)
BEFORE old batches are removed, so a reader either sees a consistent
committed state or fails LOUDLY (plan-time file listing raced a
compaction's retire step) — never a torn/wrong result.

Invariants checked on every successful read:
1. all K keys present, no duplicates (the merge collapsed everything);
2. every key carries the SAME version (each round upserts all keys in
   one atomic batch commit — mixed versions would be a torn read);
3. versions are monotone non-decreasing per reader thread (no reader
   ever travels back in time);
4. the restored STALE bundle job (old writetimes) never resurrects old
   values into a read (merge-on-read shadows it).
Read failures from the known plan-vs-retire race are counted as
retries (the documented staleness bound), never as wrong results.

Usage: python scripts/soak_concurrent_readers.py [rounds] [readers]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import Row


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_readers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_keys = 200

    from cassandra_analytics_spark.session import get_session
    from cassandra_analytics_spark.sinks.bulk_writer import (
        bulk_write,
        committed_batches,
        compact_table,
        read_bulk_table,
    )
    from cassandra_analytics_spark.sinks.bundles import (
        bundle_write,
        restore_bundles,
    )

    spark = get_session(app_name="soak-readers")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak-readers-")
    table = os.path.join(root, "tbl")
    store = os.path.join(root, "store")
    os.makedirs(store)

    def batch_rows(version: int):
        return [
            Row(k=i, v=f"v{version}-{i}", version=version,
                writetime=1_000_000 + version)
            for i in range(n_keys)
        ]

    # version 1 committed up front; a STALE bundle job (version 0,
    # older writetimes) staged for mid-soak restores
    bulk_write(spark.createDataFrame(batch_rows(1)), table, ["k"])
    stale_job = bundle_write(
        spark.createDataFrame(batch_rows(0)), store, ["k"]
    ).job_dir

    stop = threading.Event()
    errors: list[str] = []
    stats = {
        "reads_ok": 0, "reads_retried": 0, "asof_ok": 0,
        "compactions": 0, "restores": 0, "writes": 0,
        "max_lag_batches": 0,
    }
    lock = threading.Lock()
    latest_committed = [1]

    def writer():
        try:
            for r in range(2, rounds + 2):
                bulk_write(spark.createDataFrame(batch_rows(r)), table, ["k"])
                with lock:
                    stats["writes"] += 1
                latest_committed[0] = r
                if r % 5 == 0:
                    compact_table(spark, table, ["k"])
                    with lock:
                        stats["compactions"] += 1
                if r % 7 == 0:
                    # restore the STALE job: a new committed batch whose
                    # writetimes are older than everything live
                    restore_bundles(spark, stale_job, table)
                    with lock:
                        stats["restores"] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"writer: {type(e).__name__}: {e}")
        finally:
            stop.set()

    def reader(idx: int):
        last_version = 0
        while not stop.is_set() or idx == 0:
            try:
                rows = read_bulk_table(spark, table, ["k"]).collect()
            except Exception as e:  # noqa: BLE001
                # the documented staleness bound: plan-time batch listing
                # raced a compaction's retire step — loud failure, retry
                msg = f"{type(e).__name__}: {e}"
                if "exist" in msg or "FileNotFound" in msg or "PATH_NOT_FOUND" in msg:
                    with lock:
                        stats["reads_retried"] += 1
                    continue
                errors.append(f"reader{idx}: {msg}")
                break
            floor = latest_committed[0]
            got = {}
            dup = False
            for row in rows:
                if row.k in got:
                    dup = True
                got[row.k] = row
            versions = {row.version for row in rows}
            if dup:
                errors.append(f"reader{idx}: duplicate keys after merge")
            elif set(got) != set(range(n_keys)):
                errors.append(
                    f"reader{idx}: torn read, {len(got)}/{n_keys} keys"
                )
            elif len(versions) != 1:
                errors.append(
                    f"reader{idx}: mixed versions in one read: {sorted(versions)}"
                )
            else:
                v = versions.pop()
                if v < last_version:
                    errors.append(
                        f"reader{idx}: went back in time {last_version}->{v}"
                    )
                elif v == 0:
                    errors.append(
                        f"reader{idx}: stale restored bundle resurrected v0"
                    )
                else:
                    with lock:
                        stats["reads_ok"] += 1
                        stats["max_lag_batches"] = max(
                            stats["max_lag_batches"], floor - v
                        )
                    last_version = v
            if errors:
                break
            if idx == 0 and stop.is_set():
                break

        # snapshot read: as-of the newest batch id observed right now
        try:
            batches = committed_batches(table)
            if batches:
                as_of = os.path.basename(batches[-1])
                n = read_bulk_table(
                    spark, table, ["k"], as_of_batch=as_of
                ).count()
                if n == n_keys:
                    with lock:
                        stats["asof_ok"] += 1
                else:
                    errors.append(f"reader{idx}: as_of read {n}/{n_keys} rows")
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            if "exist" in msg or "FileNotFound" in msg:
                with lock:
                    stats["reads_retried"] += 1
            else:
                errors.append(f"reader{idx} as_of: {msg}")

    t0 = time.time()
    threads = [threading.Thread(target=writer)]
    threads += [
        threading.Thread(target=reader, args=(i,)) for i in range(n_readers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    final = read_bulk_table(spark, table, ["k"]).collect()
    final_ok = (
        len(final) == n_keys
        and {r.version for r in final} == {rounds + 1}
    )
    if not final_ok:
        errors.append(
            f"final state wrong: {len(final)} rows, "
            f"versions {sorted({r.version for r in final})}"
        )

    print(
        f"rounds={rounds} readers={n_readers} wall={wall:.1f}s "
        f"reads_ok={stats['reads_ok']} retried={stats['reads_retried']} "
        f"asof_ok={stats['asof_ok']} compactions={stats['compactions']} "
        f"restores={stats['restores']} max_lag_batches={stats['max_lag_batches']}"
    )
    for e in errors[:5]:
        print("ERROR:", e)
    shutil.rmtree(root, ignore_errors=True)
    ok = not errors and stats["reads_ok"] > 0 and stats["compactions"] > 0
    print("SOAK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
