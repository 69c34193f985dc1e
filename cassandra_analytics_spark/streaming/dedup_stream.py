"""Streaming incremental dedup: the ingest-batch recipe as a stream.

Combines the two scale primitives this engine already has — Structured
Streaming micro-batches and the bucketed incremental MinHash-LSH index
(:mod:`..operators.dedup_index`) — into the shape a 100 TB/day training
corpus actually runs: documents arrive continuously, each micro-batch
pays only for its own signatures plus an exchange-free join against the
persistent index, confirmed near-dup pairs stream out, and the batch
joins the index for the next trigger.

``foreachBatch`` is the right tool (not a stateful operator): the dedup
state is the bucketed index TABLE — far too large for the streaming
state store at corpus scale, already persistent, already incremental.

Delivery semantics: micro-batch replay (at-least-once) is harmless by
construction —

- pair/doc outputs go to per-batch subdirectories overwritten on replay
  (idempotent publish keyed by ``batch_id``);
- a replayed index append duplicates banded rows, which cannot change
  results: ``incremental_candidates`` deduplicates the corpus on
  (band, bucket, id) before both the candidate join and the hot-bucket
  occupancy count (exchange-free off the bucket layout), so duplicate
  index rows only cost storage;
- in-batch duplicate ids collapse to a DETERMINISTIC winner
  (greatest-text-wins, the repo's LWW tiebreak convention) so a replay
  republishes byte-identical pairs even when a batch carries two texts
  for one id (round-7 streaming adversarial pass);
- the doc store stamps each dir with ``__batch_id`` and reads resolve
  latest-batch-wins, so a doc re-ingested with changed content always
  confirms later pairs against its NEWEST text instead of whichever
  copy a dropDuplicates happened to keep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cassandra_analytics_spark.operators.dedup_index import (
    LshIndexSpec,
    build_index,
    ingest_batch,
)


def _latest_store_texts(
    spark, doc_store: str, id_col: str, text_col: str
) -> DataFrame | None:
    """Latest text per document id from the per-batch doc store, or None
    when the store has no batch dirs yet.

    mergeSchema=true: a store whose OLD dirs predate the ``__batch_id``
    stamp must still surface the column for the new dirs — the default
    single-file schema sample would either hide it (losing latest-wins)
    or read old rows' texts as the winners of an all-NULL max_by group,
    silently dropping pre-upgrade documents from the confirm
    (/code-review r7).
    """
    if not (
        os.path.isdir(doc_store)
        and any(d.startswith("batch-") for d in os.listdir(doc_store))
    ):
        return None
    stored = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(doc_store, "batch-*")
    )
    if "__batch_id" not in stored.columns:
        # store written entirely before the __batch_id stamp: keep the
        # old (arbitrary-on-conflict) behavior
        return stored.select(id_col, text_col)
    # A doc re-ingested with changed content exists in SEVERAL batch
    # dirs; the confirm must use the LATEST text or pair scores flicker
    # depending on which copy dropDuplicates kept. Latest-batch-wins is
    # deterministic: ids are unique within a dir (collapsed at ingest)
    # so (id, __batch_id) is unique across the store. coalesce(-1):
    # pre-upgrade dirs read __batch_id as NULL, which max_by would
    # IGNORE — an all-NULL group returns NULL text; -1 ranks old copies
    # below every stamped batch while keeping them readable. The text
    # itself is the struct's second key so several pre-upgrade dirs
    # carrying DIFFERENT texts for one id collapse to the repo's
    # greatest-text-wins convention instead of task order (ADVICE r8).
    rank = F.struct(
        F.coalesce(F.col("__batch_id"), F.lit(-1)).alias("b"),
        F.col(text_col).alias("t"),
    )
    return stored.groupBy(id_col).agg(F.max_by(text_col, rank).alias(text_col))


def run_incremental_dedup_stream(
    stream: DataFrame,
    index_table: str,
    doc_store: str,
    pairs_out: str,
    spec: LshIndexSpec = LshIndexSpec(),
    threshold: float = 0.9,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Start the incremental-dedup stream over a document stream.

    Per micro-batch: LSH candidates vs ``index_table`` (corpus side
    exchange-free) → exact-Jaccard confirm against ``doc_store`` (the
    accumulated document texts) → confirmed (a, b, jaccard, batch_id)
    parquet rows under ``pairs_out`` → batch appended to both the index
    and ``doc_store``. If ``index_table`` does not exist yet it is
    bootstrapped empty, so the first batch's internal duplicates are
    reported like any other batch's.
    """
    import tempfile

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="dedup-stream-ckpt-")

    # Bootstrap the index table HERE, on the driver, before the stream
    # starts — never inside the (retried) foreachBatch body, where a
    # failure between location creation and catalog registration would
    # strand an orphan warehouse dir and fail every retry.
    #
    # RESTART in a new process (ADVICE r8 medium): the default in-memory
    # catalog forgets the index table when the old session dies, but the
    # doc store and checkpoint persist — so "catalog lacks the table but
    # the doc store has batches" means a restart, NOT a fresh stream.
    # Bootstrapping EMPTY here would combine with the checkpoint (which
    # skips reprocessing) so post-restart docs are never compared against
    # the pre-restart corpus: pairs silently missed, forever. Instead the
    # index is REBUILT from the doc store's latest text per id — exactly
    # the corpus the one-shot Kappa twin would index, so post-restart
    # batches behave like a FRESH stream over the same corpus. That is
    # the contract; it is NOT bit-identical to the uncrashed run: a
    # re-ingested doc's STALE signature in the lost index could have
    # produced an extra LSH candidate (confirmed only if the LATEST
    # texts' Jaccard clears the threshold — an LSH false-negative the
    # continuous run got lucky on), and dropping those stale rows can
    # shift hot-bucket occupancy below max_bucket. The confirm step
    # always scores latest texts, so no WRONG pair is ever published
    # either way; the difference is bounded by LSH band randomness.
    boot = stream.sparkSession
    if not boot.catalog.tableExists(index_table):
        corpus = _latest_store_texts(boot, doc_store, id_col, text_col)
        if corpus is None:
            from cassandra_analytics_spark.local_data import local_df

            corpus = local_df(
                boot, [], stream.select(id_col, text_col).schema
            )
        build_index(corpus, index_table, spec, id_col, text_col)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # In-batch duplicate ids with DIFFERENT texts must collapse to a
        # DETERMINISTIC winner: a bare dropDuplicates keeps whichever copy
        # a task sees first, so a micro-batch replay (at-least-once) could
        # pick the OTHER text — different signatures, different published
        # pairs for the same batch_id, and BOTH texts' banded rows left in
        # the index across the two attempts. Greatest-text-wins is the
        # repo's LWW tiebreak convention (operators/asof.py, merge.py).
        batch = (
            batch_df.select(id_col, text_col)
            .groupBy(id_col)
            .agg(F.max(text_col).alias(text_col))
        )
        if batch.isEmpty():
            return
        texts = _latest_store_texts(spark, doc_store, id_col, text_col)
        if texts is None:
            from cassandra_analytics_spark.local_data import local_df

            texts = local_df(spark, [], batch.schema)
        confirmed = ingest_batch(
            spark, index_table, batch, texts, spec, threshold, id_col, text_col
        )
        # idempotent per-batch publish: replay overwrites the same dirs
        (
            confirmed.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(os.path.join(pairs_out, f"batch-{batch_id:010d}"))
        )
        batch.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(doc_store, f"batch-{batch_id:010d}"))

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def collected_pairs(spark, pairs_out: str, id_type: str = "long") -> DataFrame:
    """All confirmed pairs the stream has published so far — empty (with
    the right schema) before the first batch publishes, so pollers don't
    need a try/except around a path-not-found AnalysisException.
    ``id_type`` is the Spark type of the stream's id column (the a/b
    pair columns inherit it — pass e.g. ``"string"`` for string doc ids
    so the pre-publish empty frame matches the published schema).

    The pre-publish probe goes through the Hadoop FS glob, not
    ``glob.glob``, so it works on any Spark-supported store (round-10:
    the local-only probe returned the empty frame forever on HDFS/S3)."""
    from cassandra_analytics_spark.fs import glob_exists

    pattern = pairs_out.rstrip("/") + "/batch-*"
    if not glob_exists(spark, pattern):
        from cassandra_analytics_spark.local_data import local_df

        return local_df(
            spark, [], f"a {id_type}, b {id_type}, jaccard double, batch_id int"
        )
    return spark.read.parquet(pattern)


def compact_doc_store(
    spark,
    doc_store: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_files: int = 1,
    index_table: str | None = None,
    spec: LshIndexSpec = LshIndexSpec(),
) -> dict:
    """Maintenance compaction for the text-dedup stream's durable state
    (round 15 — the text twin of ``ann_index.compact_ann_index``): the
    doc store accrues one ``batch-*`` directory per trigger forever,
    and every trigger's confirm re-reads ALL of them through the
    latest-batch-wins merge — the small-files problem on the stream's
    own hot path. Compaction resolves the winners ONCE (exactly the
    read path's rank: (coalesce(__batch_id, -1), text) max_by, so
    superseded texts and replay duplicates drop) and rewrites them as
    ``num_files`` files in a single ``batch-compacted-N`` directory,
    each row KEEPING its original ``__batch_id`` so later appends still
    out-rank compacted rows exactly as they out-ranked the originals.

    CONCURRENT-READER/WRITER SAFETY (the ``compact_table``
    commit-before-remove discipline): the compacted directory is
    written under an invisible name (``__compacting`` — the readers
    glob ``batch-*``), renamed into place FIRST, and only then are the
    old directories removed — a reader never sees a gap, at worst
    duplicates its own merge collapses; a trigger that appends a new
    batch dir mid-compaction is safe because the old-dir list is
    snapshotted BEFORE the read (a dir that lands later is either
    included in the winners and kept, or untouched entirely). A crash
    at any point leaves a store that reads correctly and a compaction
    that can simply re-run. The compacted dir name is non-numeric so
    it can never collide with a stream-written ``batch-%010d``.

    ``index_table`` (optional): also REBUILD the LSH index from the
    compacted winners (``build_index`` overwrite — the documented
    restart semantics): the index accumulates replay-duplicate banded
    rows and superseded texts' stale signatures forever, and the
    rebuild is the sanctioned way to shed them (same contract as the
    restart path: post-compaction batches behave like a fresh stream
    over the same corpus). Pass the SAME ``spec`` the stream runs
    with — the rebuilt table pins it.

    Returns ``{"dirs_before", "dirs_after", "files_before",
    "files_after", "rows_after"}``."""
    from cassandra_analytics_spark.fs import (
        delete_path,
        glob_paths,
        list_files,
        rename_path,
    )

    if num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    pattern = doc_store.rstrip("/") + "/batch-*"
    # snapshot the old dirs BEFORE reading: a batch dir appended after
    # this point is either read into the winners (and kept on disk —
    # harmless duplicates) or untouched entirely
    old_dirs = glob_paths(spark, pattern)
    if not old_dirs:
        raise ValueError(
            f"{doc_store!r} has no batch-* directories — not a doc store "
            "this stream has written to (nothing to compact)"
        )
    files_before = len(list_files(spark, doc_store, suffix=".parquet"))
    stored = spark.read.option("mergeSchema", "true").parquet(pattern)
    if "__batch_id" not in stored.columns:
        stored = stored.withColumn("__batch_id", F.lit(None).cast("int"))
    # the READ path's exact rank (see _latest_store_texts): pre-stamp
    # rows rank -1, ties break greatest-text-wins; the winner keeps its
    # own __batch_id so future appends out-rank it correctly
    rank = F.struct(
        F.coalesce(F.col("__batch_id"), F.lit(-1)).alias("b"),
        F.col(text_col).alias("t"),
    )
    winners = (
        stored.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(
                    F.col(text_col).alias("t"),
                    F.col("__batch_id").alias("b"),
                ),
                rank,
            ).alias("__w")
        )
        .select(
            id_col,
            F.col("__w.t").alias(text_col),
            F.col("__w.b").alias("__batch_id"),
        )
    )
    tmp = doc_store.rstrip("/") + "/__compacting"
    delete_path(spark, tmp)
    winners.repartition(num_files).write.mode("overwrite").parquet(tmp)
    n_existing = len(
        glob_paths(spark, doc_store.rstrip("/") + "/batch-compacted-*")
    )
    target = doc_store.rstrip("/") + f"/batch-compacted-{n_existing:06d}"
    if not rename_path(spark, tmp, target):
        raise ValueError(
            f"compact_doc_store: could not move the compacted directory "
            f"into place at {target!r} — recover from {tmp!r}"
        )
    for d in old_dirs:
        if d != target:
            delete_path(spark, d)
    if index_table is not None:
        # the restart-path semantics: rebuild the index over exactly
        # the corpus the compacted store now reads as
        rebuilt = spark.read.parquet(target).select(id_col, text_col)
        build_index(rebuilt, index_table, spec, id_col, text_col)
    rows_after = spark.read.parquet(target).count()
    return {
        "dirs_before": len(old_dirs),
        "dirs_after": len(glob_paths(spark, pattern)),
        "files_before": files_before,
        "files_after": len(
            list_files(spark, doc_store, suffix=".parquet")
        ),
        "rows_after": rows_after,
    }


def compact_pairs_store(spark, pairs_out: str, num_files: int = 1) -> dict:
    """Maintenance compaction for a stream's published-pairs store
    (round 16 — the last durable store still accruing unbounded dirs,
    VERDICT r15 item 3): BOTH streaming families publish one
    ``batch-%010d`` directory per trigger forever (this module's
    ``pairs_out`` and the semantic stream's — same glob shape, same
    publish contract), and every ``collected_pairs`` /
    ``collected_semantic_pairs`` read globs them ALL — at one trigger a
    minute that is ~half a million directories a year on the consumer's
    hot path.

    Pairs are append-only FACTS (idempotent per-batch publish; readers
    ``dropDuplicates(["a", "b"])`` downstream), so compaction is
    ROW-PRESERVING: no winner resolution, every published row —
    including its ``batch_id`` — is rewritten verbatim into a single
    ``batch-compacted-N`` directory with ``num_files`` files
    (``mergeSchema`` keeps schema-evolved columns, matching the
    readers' plain multi-dir read). Works unchanged on either family's
    store because it never interprets the columns.

    CONCURRENT-READER/WRITER SAFETY (the ``compact_doc_store``
    commit-before-remove discipline, shared verbatim): old dirs are
    snapshotted BEFORE the read (a trigger publishing mid-compaction
    is either included and left on disk — duplicate rows the readers'
    dropDuplicates collapses — or untouched entirely); the compacted
    rows land under the invisible ``__compacting`` name (readers glob
    ``batch-*``), rename into place FIRST, old dirs removed LAST. A
    replayed trigger whose ORIGINAL dir was compacted away simply
    re-publishes it — duplicate (a, b) rows with the same batch_id,
    collapsed downstream. A crash at any point leaves a store that
    reads correctly and a compaction that re-runs.

    Returns ``{"dirs_before", "dirs_after", "files_before",
    "files_after", "rows_after"}``."""
    from cassandra_analytics_spark.fs import (
        delete_path,
        glob_paths,
        list_files,
        rename_path,
    )

    if num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    pattern = pairs_out.rstrip("/") + "/batch-*"
    old_dirs = glob_paths(spark, pattern)
    if not old_dirs:
        raise ValueError(
            f"{pairs_out!r} has no batch-* directories — not a pairs "
            "store a stream has published to (nothing to compact)"
        )
    files_before = len(list_files(spark, pairs_out, suffix=".parquet"))
    rows = spark.read.option("mergeSchema", "true").parquet(pattern)
    tmp = pairs_out.rstrip("/") + "/__compacting"
    delete_path(spark, tmp)
    rows.repartition(num_files).write.mode("overwrite").parquet(tmp)
    n_existing = len(
        glob_paths(spark, pairs_out.rstrip("/") + "/batch-compacted-*")
    )
    target = pairs_out.rstrip("/") + f"/batch-compacted-{n_existing:06d}"
    if not rename_path(spark, tmp, target):
        raise ValueError(
            f"compact_pairs_store: could not move the compacted "
            f"directory into place at {target!r} — recover from {tmp!r}"
        )
    for d in old_dirs:
        if d != target:
            delete_path(spark, d)
    rows_after = spark.read.parquet(target).count()
    return {
        "dirs_before": len(old_dirs),
        "dirs_after": len(glob_paths(spark, pattern)),
        "files_before": files_before,
        "files_after": len(list_files(spark, pairs_out, suffix=".parquet")),
        "rows_after": rows_after,
    }
