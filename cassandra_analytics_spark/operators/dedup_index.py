"""Persistent, bucketed MinHash-LSH index for INCREMENTAL dedup.

The one-shot :func:`~cassandra_analytics_spark.operators.dedup.
minhash_lsh_candidates` recomputes signatures for the whole corpus every
run. At 100 TB that is the wrong shape for a *growing* corpus: each new
ingest batch should only pay for (a) its own signatures and (b) a join
against the stored corpus index — never a corpus re-shuffle.

This module persists the banded LSH rows ``(id, band, bucket, sig)`` as a
**bucketed** table (``bucketBy(num_buckets, band, bucket)``, the Spark
analog of the reference's token-ring co-location — the ring IS a
bucketing scheme, ``TokenPartitioner.java:76-120``). Because a bucketed
scan reports ``HashPartitioning(band, bucket)``, the incremental
candidate join satisfies its distribution requirement straight off the
files: the corpus side has **zero Exchange** in the plan — only the
(small) new batch is shuffled into matching buckets, or broadcast when
it fits. Asserted in ``tests/test_dedup_index.py``, not just claimed.

Steady-state flow per ingest batch:

1. ``banded_rows(new_batch)`` — signatures + band buckets for new docs.
2. ``incremental_candidates(...)`` — join vs the index table
   (corpus-side exchange-free), est-Jaccard from signature agreement.
3. ``append_to_index(...)`` — the same banded rows land in the index
   (bucketed append), so the next batch sees this one as corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.dedup import (
    jaccard_from_counts,
    minhash_signatures,
    shingle_pairs,
)


@dataclass(frozen=True)
class LshIndexSpec:
    """Parameters that must agree between index build and every probe.

    ``max_bucket`` is the shared hot-bucket cap: any (band, bucket) whose
    combined occupancy (corpus + new batch) exceeds it is skipped, exactly
    as the one-shot ``minhash_lsh_candidates`` skips buckets larger than
    its ``max_bucket``. Without it a stop-shingle-skewed bucket expands
    quadratically in the incremental join, and results diverge from the
    one-shot path this module claims parity with.
    """

    num_hashes: int = 32
    bands: int = 8
    shingle_n: int = 3
    num_buckets: int = 16
    max_bucket: int = 1000

    @property
    def rows_per_band(self) -> int:
        return self.num_hashes // self.bands


def banded_rows(
    df: DataFrame,
    spec: LshIndexSpec,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, band, bucket, sig) — one row per document per band.

    Same banding as ``minhash_lsh_candidates``: bucket = xxhash64 over the
    band's signature slice (arrays hash natively — no stringify).
    """
    sigs = minhash_signatures(
        df, id_col, text_col, spec.num_hashes, spec.shingle_n
    )
    return sigs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(spec.bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * spec.rows_per_band + 1,
                        spec.rows_per_band,
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
        F.col("sig"),
    )


_SPEC_PROP = "cas.lsh.spec"


def _quoted(table_name: str) -> str:
    """Backtick-quote each dotted identifier part for generated SQL.
    ``table_name`` is taken as an UNQUOTED dotted name (the same string
    the caller passes to ``saveAsTable``); parts are quoted so reserved
    words and unusual characters survive SHOW TBLPROPERTIES / ALTER
    TABLE interpolation (ADVICE r7)."""
    return ".".join("`" + p.replace("`", "``") + "`" for p in table_name.split("."))


def _spec_json(spec: LshIndexSpec) -> str:
    import dataclasses
    import json

    return json.dumps(dataclasses.asdict(spec), sort_keys=True)


def _stored_spec(spark: SparkSession, table_name: str) -> str | None:
    """The pinned ``cas.lsh.spec`` property, or None when absent."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {_quoted(table_name)}").collect()
    return {r["key"]: r["value"] for r in rows}.get(_SPEC_PROP)


def _pin_spec(spark: SparkSession, table_name: str, spec: LshIndexSpec) -> None:
    spark.sql(
        f"ALTER TABLE {_quoted(table_name)} SET TBLPROPERTIES "
        f"('{_SPEC_PROP}'='{_spec_json(spec)}')"
    )


def _structural(spec_dict: dict) -> dict:
    """The fields that determine the STORED index layout (signature and
    bucket values, bucketBy count). ``max_bucket`` is excluded: it is a
    probe-time occupancy cap, legitimately varied per query against one
    index."""
    return {k: v for k, v in spec_dict.items() if k != "max_bucket"}


def _check_spec(spark: SparkSession, table_name: str, spec: LshIndexSpec) -> None:
    """Fail loudly when probing/appending with a spec structurally
    different from the one the index was built with (round-7 streaming
    adversarial pass): banding parameters silently change every bucket
    value, so a stream restarted with e.g. ``bands=16`` against a
    ``bands=8`` index would join new-style buckets against old-style
    buckets and MISS pairs with no error. Indexes built before the
    property existed (absent prop) are accepted as-is."""
    import dataclasses
    import json

    if not spark.catalog.tableExists(table_name):
        # pre-round-7, append_to_index on a fresh name bootstrapped the
        # table via saveAsTable(append); keep that flow working instead
        # of crashing in SHOW TBLPROPERTIES (/code-review r7)
        return
    stored = _stored_spec(spark, table_name)
    if stored is not None and _structural(json.loads(stored)) != _structural(
        dataclasses.asdict(spec)
    ):
        raise ValueError(
            f"LshIndexSpec mismatch for index table {table_name!r}: "
            f"table was built with {stored}, caller passed "
            f"{_spec_json(spec)}. Rebuild the index (build_index) or pass "
            "the original spec — probing across specs silently drops pairs."
        )


_BANDED_COLUMNS = {"id", "band", "bucket", "sig"}


def _clear_stranded_location(spark: SparkSession, table_name: str) -> None:
    """Remove a STRANDED managed-table directory: the default (in-memory)
    catalog forgets tables when a session dies, but the warehouse dir
    persists, so a crashed/killed run leaves a location that makes every
    later ``build_index`` fail with LOCATION_ALREADY_EXISTS. Only called
    when the catalog does NOT know the table and only for the table's
    DEFAULT managed location — tables at custom LOCATIONs resolve to a
    different path and are left alone (the original Spark error then
    surfaces).

    Blast radius is bounded (/code-review r7): the directory is deleted
    only when it IS a banded index (its parquet schema has exactly the
    banded columns) or is unreadable as parquet (crash garbage). Any
    OTHER readable data parked at the path — e.g. a live table of a
    concurrent session sharing the warehouse, or an unrelated dataset —
    raises a clear error instead of being rm -rf'd on the strength of
    one session's catalog amnesia. A readable NON-EMPTY banded index is
    deleted (the caller asked for an overwrite build) but LOUDLY, via a
    warning — a prior session's intact index looks identical to crash
    garbage from here, and silent deletion is how the round-8 stream
    bootstrap bug lost a corpus (ADVICE r8 medium; the stream now
    rebuilds from the doc store instead of reaching this path)."""
    import warnings

    parts = table_name.split(".")
    # both segments lowercased: Spark stores managed-table paths from the
    # lowercased identifier, so an uppercase DB segment must not make the
    # reclamation silently miss the real dir (ADVICE r8)
    db = parts[-2].lower() if len(parts) > 1 else spark.catalog.currentDatabase()
    tbl = parts[-1].lower()
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = f"{warehouse}/{tbl}" if db == "default" else f"{warehouse}/{db}.db/{tbl}"
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(loc)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return
    try:
        existing = spark.read.parquet(loc)
        existing_cols = set(existing.columns)
    except Exception:
        existing = None
        existing_cols = None  # unreadable → stranded crash garbage
    if existing_cols is not None and existing_cols != _BANDED_COLUMNS:
        raise ValueError(
            f"build_index target location {loc!r} exists, is not in the "
            f"session catalog, and holds NON-index data (columns "
            f"{sorted(existing_cols)}): refusing to delete it. Remove the "
            "directory manually or pick a different index table name."
        )
    if existing is not None and not existing.isEmpty():
        warnings.warn(
            f"build_index is overwriting a readable, non-empty banded LSH "
            f"index at {loc!r} left by a previous session (the current "
            "session's catalog does not know the table). If this index "
            "should have been REUSED rather than rebuilt, recover it by "
            "rebuilding from the document store — see "
            "run_incremental_dedup_stream's restart bootstrap.",
            stacklevel=3,
        )
    fs.delete(path, True)


def _write_banded(
    banded: DataFrame, table_name: str, spec: LshIndexSpec, mode: str
) -> None:
    spark = banded.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table_name):
        _clear_stranded_location(spark, table_name)
    (
        banded.write.mode(mode)
        .format("parquet")
        .bucketBy(spec.num_buckets, "band", "bucket")
        .sortBy("band", "bucket")
        .saveAsTable(table_name)
    )
    # overwrite: pin unconditionally. append: pin only when absent — an
    # append on a fresh name bootstraps the table (sanctioned flow), and
    # without the pin every later mismatched-spec probe would pass
    # _check_spec silently, the exact bug class the pin exists to catch
    # (ADVICE r8). An append on an EXISTING unpinned table (pre-property
    # index) is pinned with the caller's spec too: _check_spec accepted
    # it, so the caller's spec is the best available statement of the
    # layout, and pinning it stops a THIRD spec from joining the mix.
    if mode == "overwrite" or _stored_spec(spark, table_name) is None:
        _pin_spec(spark, table_name, spec)


def build_index(
    df: DataFrame,
    table_name: str,
    spec: LshIndexSpec = LshIndexSpec(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Create the bucketed index table from an initial corpus. The spec is
    pinned as a table property; later appends/probes verify against it."""
    _write_banded(banded_rows(df, spec, id_col, text_col), table_name, spec, "overwrite")


def append_to_index(
    df: DataFrame,
    table_name: str,
    spec: LshIndexSpec = LshIndexSpec(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Add a batch's banded rows; appended files keep the bucket spec.
    Raises when ``spec`` differs from the spec the table was built with."""
    _check_spec(df.sparkSession, table_name, spec)
    _write_banded(banded_rows(df, spec, id_col, text_col), table_name, spec, "append")


def incremental_candidates(
    spark: SparkSession,
    table_name: str,
    new_df: DataFrame,
    spec: LshIndexSpec = LshIndexSpec(),
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_new: bool = True,
    include_new_new: bool = True,
    new_banded: DataFrame | None = None,
    skew_observation=None,
) -> DataFrame:
    """Candidate near-dup pairs (a, b, est_jaccard) touching the new batch.

    ``new × corpus`` pairs come from the bucket equi-join against the
    bucketed index — the corpus side needs no Exchange (bucketed scan
    already satisfies the join distribution); with ``broadcast_new`` the
    new side is broadcast too, so the whole join is exchange-free.
    ``new × new`` pairs (duplicates *inside* the batch) come from the
    in-batch bucket join of the same banded rows. Output ids are ordered
    a < b and deduped across bands, matching ``minhash_lsh_candidates``
    — including its ``max_bucket`` hot-bucket cap: buckets whose combined
    corpus+batch occupancy exceeds ``spec.max_bucket`` are dropped before
    pair expansion. The corpus-side size count is a column-pruned
    (band, bucket only) scan with NO Exchange (the bucketed layout already
    clusters on the group key), so the exchange-free corpus property
    holds; the resulting hot-bucket set is tiny and broadcast.

    The corpus is deduplicated on (band, bucket, id) first — exchange-free
    (the bucket layout clusters a superset of the keys) — so duplicate
    index rows, e.g. from a replayed streaming append, can never inflate
    occupancy counts past the cap or change any result. Occupancy itself
    counts each distinct (band, bucket, id) cell once across BOTH sides
    (corpus rows matching a batch cell are excluded via a broadcast
    anti-join on the full cell key), so a replay that re-presents
    already-indexed docs sees the same hot-bucket set as the first
    attempt — while a re-ingest with CHANGED content still counts the
    old signature's rows, which occupy different cells and still feed
    pair generation.

    ``new_banded`` lets a caller that already computed (and ideally
    checkpointed) the batch's banded rows pass them in, avoiding a second
    signature computation.
    """
    _check_spec(spark, table_name, spec)
    if new_banded is None:
        new_banded = banded_rows(new_df, spec, id_col, text_col)
    corpus = spark.table(table_name).dropDuplicates(["band", "bucket", "id"])
    probe = F.broadcast(new_banded) if broadcast_new else new_banded

    # Hot-bucket cap, shared with the one-shot path: combined occupancy
    # per (band, bucket) over corpus + new batch, counting each distinct
    # (band, bucket, id) CELL once. The corpus side is anti-joined
    # against the batch's banded cells first (broadcast — corpus stays
    # exchange-free) so a replayed batch whose rows already landed in
    # the index (partial append + retry) is not counted on both sides:
    # double-counting would inflate occupancy ~2x for affected buckets
    # and could push a bucket past max_bucket only on the replay,
    # silently dropping its pairs and breaking the replay-idempotence
    # the streaming path relies on. Anti-joining on the full cell — not
    # just the id — matters for re-ingests with CHANGED content: the old
    # signature's rows land in different cells than the batch's, still
    # occupy their buckets, and still participate in pair generation, so
    # they must still count (an id-only anti-join would undercount them
    # and let an over-full bucket escape the cap).
    # (no .distinct() on the build side: left_anti ignores duplicates,
    # and skipping it keeps the probe path free of an extra shuffle —
    # the broadcast is batch_docs x bands rows of three narrow columns)
    batch_cells = new_banded.select("band", "bucket", "id")
    corpus_sizes = (
        corpus.join(F.broadcast(batch_cells), ["band", "bucket", "id"], "left_anti")
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__nc"))
    )
    new_sizes = new_banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__nn")
    )
    hot = (
        corpus_sizes.join(new_sizes, ["band", "bucket"], "full_outer")
        .filter(
            F.coalesce("__nc", F.lit(0)) + F.coalesce("__nn", F.lit(0))
            > spec.max_bucket
        )
    )
    if skew_observation is not None:
        # the LSH-cap loudness contract (round-9): report how many
        # buckets the occupancy cap dropped and how many banded cells
        # they held, riding the existing aggregation. `hot` empty (no
        # over-cap buckets) is the COMMON case — ensure the AQE
        # exclusion so the CollectMetrics node survives it on foreign
        # sessions (round-10 ADVICE)
        from cassandra_analytics_spark.stats import ensure_metrics_survive_empty

        ensure_metrics_survive_empty(spark)
        occ = F.coalesce("__nc", F.lit(0)) + F.coalesce("__nn", F.lit(0))
        hot = hot.observe(
            skew_observation,
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("skipped_buckets"),
            F.coalesce(F.sum(occ).cast("long"), F.lit(0).cast("long")).alias(
                "skipped_rows"
            ),
        )
    hot = hot.select("band", "bucket")

    def est(sa, sb) -> F.Column:
        return (
            F.aggregate(
                F.zip_with(sa, sb, lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(spec.num_hashes)
        ).cast("double")

    nc = (
        probe.select(
            F.col("band"), F.col("bucket"), F.col("id").alias("nid"), F.col("sig").alias("nsig")
        )
        .join(F.broadcast(hot), ["band", "bucket"], "left_anti")
        .join(
            corpus.select(
                "band", "bucket", F.col("id").alias("cid"), F.col("sig").alias("csig")
            ),
            ["band", "bucket"],
        )
    )
    nc_pairs = nc.filter(F.col("nid") != F.col("cid")).select(
        F.least("nid", "cid").alias("a"),
        F.greatest("nid", "cid").alias("b"),
        est(F.col("nsig"), F.col("csig")).alias("est_jaccard"),
    )
    out = nc_pairs
    if include_new_new:
        left = new_banded.select(
            "band", "bucket", F.col("id").alias("ida"), F.col("sig").alias("siga")
        ).join(F.broadcast(hot), ["band", "bucket"], "left_anti")
        right = new_banded.select(
            "band", "bucket", F.col("id").alias("idb"), F.col("sig").alias("sigb")
        )
        nn = (
            left.join(F.broadcast(right) if broadcast_new else right, ["band", "bucket"])
            .filter(F.col("ida") < F.col("idb"))
            .select(
                F.col("ida").alias("a"),
                F.col("idb").alias("b"),
                est(F.col("siga"), F.col("sigb")).alias("est_jaccard"),
            )
        )
        out = nc_pairs.unionByName(nn)
    return out.dropDuplicates(["a", "b"])


def confirm_candidates(
    candidates: DataFrame,
    texts: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard for ONLY the candidate pairs (a, b).

    The scale shape that makes incremental dedup cheap: shingles are
    computed for just the documents that appear in some candidate pair (a
    semi-join against the candidate id set — tiny vs the corpus), then
    each pair's intersection comes from joining a's shingles to b's on
    (b, sh). Work is proportional to candidate volume, never corpus size.
    Output: (a, b, jaccard) with jaccard >= threshold — same score as
    :func:`~cassandra_analytics_spark.operators.dedup.ngram_jaccard_pairs`
    (no df cap here: the candidate set is already LSH-bounded).

    Both shared intermediates are persisted (bounded operator-cache
    LRU): the pair list feeds the involved-id broadcast AND the
    intersection join — unpersisted, a LAZY candidate plan (the whole
    LSH pipeline) would execute once per consumer (measured: 9 corpus
    scans in dedup_minhash_confirmed's plan before this, 2 after);
    likewise the involved-docs shingle index feeds sizes and both join
    sides.
    """
    from cassandra_analytics_spark.operators._cache import register_cached

    pairs = candidates.select("a", "b").persist()
    involved = pairs.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    docs = texts.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    ).join(F.broadcast(involved.withColumnRenamed(id_col, "id")), "id")
    sh = shingle_pairs(docs, id_col="id", text_col="__text", n=shingle_n).persist()
    register_cached(pairs, sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        pairs.join(sh.withColumnsRenamed({"id": "a"}), "a")
        .join(sh.withColumnsRenamed({"id": "b"}), ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    result = jaccard_from_counts(common, sizes, threshold)
    # callers that materialize the result (ingest_batch's eager
    # checkpoint) can release these immediately via _cache.release_cached
    result._cached_intermediates = (pairs, sh)
    return result


def ingest_batch(
    spark: SparkSession,
    table_name: str,
    new_df: DataFrame,
    texts: DataFrame,
    spec: LshIndexSpec = LshIndexSpec(),
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_pushdown_ids: int = 10_000,
    skew_observation=None,
) -> DataFrame:
    """The end-to-end incremental dedup recipe, one call per ingest batch:

    1. :func:`incremental_candidates` — LSH candidates touching the batch
       (corpus side exchange-free off the bucketed index),
    2. :func:`confirm_candidates` — exact Jaccard on candidates only,
       against ``texts`` (the document store holding previously ingested
       docs; the new batch's texts are added automatically),
    3. the batch's banded rows join the index, so the NEXT batch sees
       this one as corpus.

    The batch's signatures are computed ONCE (banded rows eagerly
    checkpointed) and reused by both the candidate join and the index
    append — signature generation is the dominant per-batch cost.

    Scale posture of the text fetch: the candidate set is materialized
    first (eager checkpoint — also pins one partitioning for both uses),
    and when it involves at most ``max_pushdown_ids`` distinct documents
    (the normal case: candidates ∝ batch size, not corpus size) the id
    list is pushed into the ``texts`` scan as an IN filter, so the
    document store is row-group-pruned instead of scanned per batch —
    the F1-pushdown shape. The cap check is a ``count()`` (not a capped
    collect), so the over-cap case materializes nothing on the driver —
    the broadcast semi-join inside :func:`confirm_candidates` takes over
    (one full column-pruned scan).

    The confirmed pairs are materialized BEFORE the append so the
    returned DataFrame can never observe the index state it just
    changed. Returns (a, b, jaccard >= threshold).
    """
    banded = banded_rows(new_df, spec, id_col, text_col).localCheckpoint(
        eager=True
    )
    cands = incremental_candidates(
        spark, table_name, new_df, spec, id_col, text_col, new_banded=banded,
        skew_observation=skew_observation,
    ).localCheckpoint(eager=True)
    # the BATCH's text wins for ids present on both sides: a re-ingest
    # with changed content must confirm against the new text, and a bare
    # union + dropDuplicates would keep whichever copy Spark encounters
    # first — pair scores would flicker across the threshold between
    # runs. In-batch duplicate ids were already collapsed by the
    # caller's contract (banded_rows dedupes per id); dropDuplicates
    # stays as a guard for stores that carry several copies of one doc.
    new_texts = new_df.select(id_col, text_col)
    all_texts = (
        texts.select(id_col, text_col)
        .join(new_texts.select(id_col), id_col, "left_anti")
        .unionByName(new_texts)
        .dropDuplicates([id_col])
    )
    # cheap count first (cands is checkpointed, the id set is tiny) so
    # the over-cap path never materializes 10k+ ids on the driver — only
    # when the list fits the cap is it collected for the IN-pushdown
    involved_ids = cands.select(F.explode(F.array("a", "b")).alias("i")).distinct()
    if involved_ids.count() <= max_pushdown_ids:
        involved = [r[0] for r in involved_ids.collect()]
        all_texts = all_texts.filter(F.col(id_col).isin(involved))
    lazy_confirmed = confirm_candidates(
        cands, all_texts, spec.shingle_n, threshold, id_col, text_col
    )
    confirmed = lazy_confirmed.localCheckpoint(eager=True)
    # the checkpoint materialized everything — the confirm's persisted
    # intermediates are dead; release them instead of letting them age
    # out of the LRU while occupying memory (one pair per ingest batch
    # would pile up in a streaming session)
    from cassandra_analytics_spark.operators._cache import release_cached

    release_cached(*getattr(lazy_confirmed, "_cached_intermediates", ()))
    _write_banded(banded, table_name, spec, "append")
    return confirmed
