"""S3-compatible bundle transport for the bulk writer (W4 blob-upload path).

The reference's second write transport (vs direct Sidecar upload) ships
SSTables through an object store: the writer zips consecutive sorted
SSTables into *bundles* capped at a size threshold, uploads each bundle
plus a manifest to S3, and the destination cluster *restores slices* —
each replica downloads only the bundles overlapping its token ranges and
imports them (reference
``bulkwriter/blobupload/SSTablesBundler.java:39-49`` bundling loop,
``BundleManifest.java`` per-component checksums,
``BlobDataTransferApi.java`` upload/restore-slice calls,
``ImportCompletionCoordinator.java:139-159`` waits for every slice at CL).

Spark-first analog over parquet:

1. ``bundle_write`` runs the same W1/W2 pipeline as ``bulk_write``
   (validate → token → ``repartitionByRange`` + sort) but **keeps the
   token column in the emitted files**, so each member file's parquet
   row-group stats carry its [min,max] token — the Summary.db
   first/last-token analog that makes restore-side slice pruning free.
   Staged files are grouped in token order into zip bundles of at most
   ``max_bundle_bytes`` and published to the store under a job directory
   with a bundle manifest (per-bundle and per-member digests + token
   bounds), committed by atomic rename — nothing partial is ever visible.
2. ``restore_bundles`` is the restore-slice: pick the bundles whose token
   bounds overlap the requested range (skipping whole bundles without
   opening them), verify digests, unpack members into a staging batch dir
   of the destination table, and commit it with the same atomic-rename
   discipline as ``bulk_write`` — the restored batch is a normal
   committed batch that ``read_bulk_table`` merges like any other.

Scale posture: bundling is metadata-light — member token bounds come from
parquet footers (no data scan), grouping is O(#files) on the driver, and
the restore reads only overlapping bundles (an executor-parallel variant
would map the per-task file lists through ``mapPartitions``, exactly as
the reference bundles inside each RecordWriter task). The zip uses
STORED entries: parquet is already compressed, so bundling never
recompresses data bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
import zipfile
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.functions.tokens import token_column
from cassandra_analytics_spark.operators.merge import TOMBSTONE, TTL, WRITETIME
from cassandra_analytics_spark.schema import CqlTable
from cassandra_analytics_spark.sinks.bulk_writer import (
    BulkWriteError,
    WriteResult,
    _file_digest,
    _validate,
)

TOKEN_COLUMN = "__token"


@dataclass
class BundleInfo:
    name: str
    bytes: int
    digest: str
    start_token: int
    end_token: int
    num_rows: int
    members: dict[str, dict]


@dataclass
class BundleStoreResult:
    job_dir: str
    manifest_path: str
    num_bundles: int
    num_rows: int
    bundles: list[BundleInfo]


def _token_bounds(parquet_path: str) -> tuple[int, int, int]:
    """(min_token, max_token, num_rows) from parquet footer stats only."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(parquet_path)
    schema_names = md.schema.to_arrow_schema().names
    col_idx = schema_names.index(TOKEN_COLUMN)
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(col_idx).statistics
        if stats is None or not stats.has_min_max:
            raise BulkWriteError(
                f"missing token stats in {parquet_path} row group {rg}"
            )
        lo = stats.min if lo is None else min(lo, stats.min)
        hi = stats.max if hi is None else max(hi, stats.max)
    return int(lo), int(hi), md.num_rows


def bundle_write(
    df: DataFrame,
    store_path: str,
    partition_keys: Sequence[str],
    clustering_keys: Sequence[str] = (),
    table: CqlTable | None = None,
    write_timestamp_micros: int | None = None,
    ttl_seconds: int | None = None,
    num_partitions: int | None = None,
    max_records_per_file: int = 1_000_000,
    max_bundle_bytes: int = 160 << 20,
    digest_algorithm: str = "md5",
) -> BundleStoreResult:
    """Write a DataFrame to an object-store directory as zip bundles.

    ``max_bundle_bytes`` defaults to the reference's 160 MiB SSTable roll
    size (``WriterOptions.java:59-61``); each bundle holds at least one
    member file even if that file alone exceeds the cap (the reference's
    bundler closes a bundle when the running size crosses the threshold).
    """
    _validate(df, partition_keys, clustering_keys, table)

    wt = (
        F.lit(write_timestamp_micros)
        if write_timestamp_micros is not None
        else F.lit(int(time.time() * 1_000_000))
    )
    out = df
    if WRITETIME not in df.columns or write_timestamp_micros is not None:
        out = out.withColumn(WRITETIME, wt.cast("long"))
    if TTL not in out.columns:
        out = out.withColumn(TTL, F.lit(ttl_seconds).cast("int"))
    if TOMBSTONE not in out.columns:
        out = out.withColumn(TOMBSTONE, F.lit(None).cast("string"))

    # W2, but the token column is materialized into the files: member
    # token bounds then come from parquet footers for free.
    out = out.withColumn(
        TOKEN_COLUMN, token_column(*[F.col(k) for k in partition_keys])
    )
    n = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    out = out.repartitionByRange(n, F.col(TOKEN_COLUMN)).sortWithinPartitions(
        TOKEN_COLUMN, *partition_keys, *clustering_keys
    )

    job_id = f"job-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    scratch = os.path.join(store_path, f"_scratch-{job_id}")
    staging = os.path.join(store_path, f"_staging-{job_id}")
    job_dir = os.path.join(store_path, job_id)
    (
        out.write.mode("errorifexists")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(scratch)
    )

    members = []
    for fname in sorted(os.listdir(scratch)):
        if not fname.endswith(".parquet"):
            continue
        fpath = os.path.join(scratch, fname)
        lo, hi, rows = _token_bounds(fpath)
        members.append((lo, hi, rows, fname, fpath))
    if not members:
        shutil.rmtree(scratch)
        raise BulkWriteError("bundle_write produced no data files")
    members.sort()  # token order → bundles cover contiguous ring spans

    os.makedirs(staging)
    bundles: list[BundleInfo] = []
    group: list[tuple[int, int, int, str, str]] = []
    group_bytes = 0

    def _close_bundle() -> None:
        nonlocal group, group_bytes
        if not group:
            return
        name = f"bundle-{len(bundles):05d}.zip"
        zpath = os.path.join(staging, name)
        member_meta: dict[str, dict] = {}
        with zipfile.ZipFile(zpath, "w", compression=zipfile.ZIP_STORED) as zf:
            for lo, hi, rows, fname, fpath in group:
                zf.write(fpath, arcname=fname)
                member_meta[fname] = {
                    "bytes": os.path.getsize(fpath),
                    digest_algorithm: _file_digest(fpath, digest_algorithm),
                    "rows": rows,
                    "start_token": lo,
                    "end_token": hi,
                }
        bundles.append(
            BundleInfo(
                name=name,
                bytes=os.path.getsize(zpath),
                digest=_file_digest(zpath, digest_algorithm),
                start_token=min(m[0] for m in group),
                end_token=max(m[1] for m in group),
                num_rows=sum(m[2] for m in group),
                members=member_meta,
            )
        )
        group, group_bytes = [], 0

    for entry in members:
        fsize = os.path.getsize(entry[4])
        if group and group_bytes + fsize > max_bundle_bytes:
            _close_bundle()
        group.append(entry)
        group_bytes += fsize
    _close_bundle()
    shutil.rmtree(scratch)

    manifest = {
        "job": job_id,
        "partition_keys": list(partition_keys),
        "clustering_keys": list(clustering_keys),
        "token_column": TOKEN_COLUMN,
        "digest_algorithm": digest_algorithm,
        "num_rows": sum(b.num_rows for b in bundles),
        "bundles": {
            b.name: {
                "bytes": b.bytes,
                digest_algorithm: b.digest,
                "start_token": b.start_token,
                "end_token": b.end_token,
                "rows": b.num_rows,
                "members": b.members,
            }
            for b in bundles
        },
    }
    manifest_path = os.path.join(staging, "_bundle_manifest.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)

    # the "upload completed" commit point: one atomic rename
    os.rename(staging, job_dir)
    return BundleStoreResult(
        job_dir=job_dir,
        manifest_path=os.path.join(job_dir, "_bundle_manifest.json"),
        num_bundles=len(bundles),
        num_rows=manifest["num_rows"],
        bundles=bundles,
    )


def store_jobs(store_path: str) -> list[str]:
    if not os.path.isdir(store_path):
        return []
    return sorted(
        os.path.join(store_path, d)
        for d in os.listdir(store_path)
        if d.startswith("job-") and os.path.isdir(os.path.join(store_path, d))
    )


def restore_bundles(
    spark: SparkSession,
    job_dir: str,
    table_path: str,
    token_range: tuple[int, int] | None = None,
    verify: bool = True,
) -> WriteResult:
    """Restore-slice: import a bundle job (optionally only the bundles
    overlapping ``token_range``) as one committed batch of ``table_path``.

    Whole bundles outside the range are skipped without being opened —
    the reference's per-replica slice selection. With ``verify`` each
    bundle's digest is checked before unpacking and each member's digest
    after (corrupted uploads fail the restore, nothing is committed;
    the reference re-validates written SSTables the same way,
    ``RecordWriter.java:351-353``).
    """
    with open(os.path.join(job_dir, "_bundle_manifest.json")) as f:
        manifest = json.load(f)
    algo = manifest["digest_algorithm"]

    selected = {
        name: meta
        for name, meta in manifest["bundles"].items()
        if token_range is None
        or (
            meta["start_token"] <= token_range[1]
            and meta["end_token"] >= token_range[0]
        )
    }
    if not selected:
        raise BulkWriteError(
            f"no bundles overlap token range {token_range} in {job_dir}"
        )

    batch_id = f"batch-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    staging = os.path.join(table_path, f"_staging-{batch_id}")
    final_dir = os.path.join(table_path, batch_id)
    os.makedirs(staging)
    try:
        files: dict[str, dict] = {}
        num_rows = 0
        for name in sorted(selected):
            meta = selected[name]
            zpath = os.path.join(job_dir, name)
            if verify and _file_digest(zpath, algo) != meta[algo]:
                raise BulkWriteError(f"bundle digest mismatch: {name}")
            with zipfile.ZipFile(zpath) as zf:
                zf.extractall(staging)
            for fname, fmeta in meta["members"].items():
                fpath = os.path.join(staging, fname)
                if verify and _file_digest(fpath, algo) != fmeta[algo]:
                    raise BulkWriteError(f"member digest mismatch: {fname}")
                files[fname] = {"bytes": fmeta["bytes"], algo: fmeta[algo]}
                num_rows += fmeta["rows"]

        batch_manifest = {
            "batch": batch_id,
            "mode": "append",
            "restored_from": manifest["job"],
            "partition_keys": manifest["partition_keys"],
            "clustering_keys": manifest["clustering_keys"],
            "digest_algorithm": algo,
            "num_rows": num_rows,
            "files": files,
        }
        with open(os.path.join(staging, "_manifest.json"), "w") as f:
            json.dump(batch_manifest, f, indent=2)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise

    os.rename(staging, final_dir)
    return WriteResult(
        batch_dir=final_dir,
        num_files=len(files),
        num_rows=num_rows,
        manifest_path=os.path.join(final_dir, "_manifest.json"),
    )
