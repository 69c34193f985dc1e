"""Text analysis for large-scale training-data pipelines.

All column expressions use built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs on the hot path, so these scale
linearly with partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic
# language-ID. Deliberately small: the point is a cheap JVM-side signal.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " que ", " los ", " es "],
}

PUNCT_PATTERN = r"[.,!?;:]"
TOKEN_PATTERN = r"\s+"
# BPE-ish word/number/punct splitter: letters+digits runs or single symbols.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank/NULL text.

    NULL text counts as empty (0), not NULL — the text layer's uniform
    convention (round-8 hostile pass: a NULL doc used to yield a NULL
    count here, a dropped row in repetition_stats, and a 0.0 in
    quality_features — three different answers to one question)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, TOKEN_PATTERN))
    )


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via a BPE-style regex (letters / digit runs /
    single punctuation). NULL text counts as empty (0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(
            F.coalesce(c, F.lit("")), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
        )
    )


def punct_count(col: Column | str) -> Column:
    """Punctuation-character count. NULL text counts as empty (0) — the
    text layer's uniform convention (round-8 review: this was the one
    counter still answering NULL)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_PATTERN, ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append cheap quality signals: char count, token count, mean token
    length, punctuation ratio, uppercase ratio, digit ratio.

    NULL text is scored as empty text (all features 0) — previously the
    counts came back NULL while the ratios came back 0.0, an
    inconsistent mix (round-8 hostile pass)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_tokens = token_count(c)
    return (
        df.withColumn("q_chars", n_chars)
        .withColumn("q_tokens", n_tokens)
        .withColumn(
            "q_mean_token_len",
            F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "q_punct_ratio",
            F.when(n_chars > 0, punct_count(c) / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_upper_ratio",
            F.when(
                n_chars > 0,
                (n_chars - F.length(F.regexp_replace(c, "[A-Z]", ""))) / n_chars,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_digit_ratio",
            F.when(
                n_chars > 0,
                (n_chars - F.length(F.regexp_replace(c, "[0-9]", ""))) / n_chars,
            ).otherwise(F.lit(0.0)),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals (the Gopher/C4-style quality rules
    that catch boilerplate and degenerate generations):

    * ``n_tokens`` — total word tokens,
    * ``distinct_ratio`` — distinct words / total (low = repetitive),
    * ``top_word_ratio`` — most frequent word's share of the doc,
    * ``dup_bigram_ratio`` — fraction of word bigrams that are repeats.

    One explode + one doc-keyed aggregation per granularity (map-side
    combine); every expression stays JVM-side. Ratios divide exact
    integer counts as doubles — engine-exact, oracle-checkable.

    EVERY input document gets a row: a doc whose text is NULL, empty, or
    normalizes to nothing (punctuation-only) reports ``n_tokens = 0``
    and 0.0 ratios. Previously such docs either vanished from the output
    (NULL text) or — worse — counted ONE phantom token (the empty string
    ``split`` emits), reporting ``n_tokens=1, top_word_ratio=1.0`` and
    inflating any downstream token-budget sum (round-8 hostile pass).
    """
    # array_remove drops the "" that split() emits for empty input; a
    # doc with no real words then contributes no unigram rows
    words = df.select(
        F.col(id_col).alias("id"),
        F.array_remove(
            F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " "),
            "",
        ).alias("__ws"),
    )
    unigrams = words.select("id", F.explode("__ws").alias("w"))
    wc = unigrams.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = wc.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )

    bi = words.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("__ws") - 2, F.lit(0)))
        ).alias("__i"),
        F.col("__ws"),
    ).filter(F.col("__i") < F.size("__ws") - 1)
    bigrams = bi.select(
        "id",
        F.concat_ws(
            " ",
            F.element_at("__ws", F.col("__i") + 1),
            F.element_at("__ws", F.col("__i") + 2),
        ).alias("bg"),
    )
    bc = bigrams.groupBy("id", "bg").agg(F.count(F.lit(1)).alias("c"))
    per_doc_bi = bc.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.sum(F.col("c") - 1).alias("n_dup_bigrams"),
    )

    # left join from the full id set: wordless docs still get a row
    all_ids = words.select("id").distinct()
    n_tok = F.coalesce(F.col("n_tokens"), F.lit(0))
    return (
        all_ids.join(per_doc, "id", "left")
        .join(per_doc_bi, "id", "left")
        .select(
            F.col("id").alias(id_col),
            n_tok.cast("long").alias("n_tokens"),
            F.when(
                n_tok > 0,
                F.col("n_distinct").cast("double") / n_tok.cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("distinct_ratio"),
            F.when(
                n_tok > 0,
                F.col("top_c").cast("double") / n_tok.cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_word_ratio"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.col("n_dup_bigrams").cast("double")
                / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_ratio"),
        )
    )


def language_id(col: Column | str, default: str = "unknown") -> Column:
    """Heuristic language ID: score per language = number of marker
    stopwords present; pick the argmax, 'unknown' when no marker hits.

    Pure expression tree (contains + CASE) → codegen, broadcast-free.
    """
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    scores = [
        (
            lang,
            sum(
                (F.contains(padded, F.lit(m))).cast("int")
                for m in markers
            ),
        )
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit(default)
    # Build CASE from last to first so earlier languages win score ties.
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str, algorithm: str = "md5") -> Column:
    """Deterministic document fingerprint for exact dedup / lineage.

    md5/sha2 for portable (oracle-checkable) fingerprints; xxhash64 for the
    fast path at scale (8-byte key → cheaper shuffle than 32-hex string).
    """
    c = F.col(col) if isinstance(col, str) else col
    if algorithm == "md5":
        return F.md5(c)
    if algorithm == "sha256":
        return F.sha2(c, 256)
    if algorithm == "xxhash64":
        return F.xxhash64(c)
    raise ValueError(f"unknown fingerprint algorithm: {algorithm}")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for near-dup shingling: lowercase, collapse
    whitespace, strip punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def _per_doc_term_counts(
    df: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, len, __tf_0 .. __tf_{k-1}) — one row per document, terms in
    COLUMNS, from a single corpus pass.

    The shared core of TF-IDF and BM25: ONE normalization + ONE explode,
    then ONE per-doc aggregation computing the document length and every
    query term's count together (``count_if`` per term — codegen,
    map-side partial agg collapses to ≤ docs×partitions rows before the
    exchange). Keeping terms as columns (instead of ``stack``-ing to
    long form) lets the scorers fold the per-term math into a pure
    projection — no join on the term key, no second per-doc aggregation.
    The only shuffle is the doc-keyed partial aggregate, and the output
    is #docs rows — the table callers persist so the corpus-frequency
    row and the score projection share one explode pass.
    """
    # Corpus words are matched in NORMALIZED form (lowercase, punctuation
    # stripped) — a term that differs from its own normalization (e.g.
    # 'The', 'U.S.') would silently match nothing, and one that
    # normalizes to several words (or none) has no single-token match
    # semantics at all. Normalize each term by the same rule and reject
    # the multi-word/empty cases loudly.
    import re as _re

    normed = []
    for t in query_terms:
        nt = _re.sub(r"\s+", " ", _re.sub(r"[^a-z0-9\s]", " ", t.lower())).strip()
        if not nt or " " in nt:
            raise ValueError(
                f"query term {t!r} normalizes to {nt!r} — terms must be a "
                "single word under the corpus normalization rule"
            )
        normed.append(nt)
    dupes = {t for t in normed if normed.count(t) > 1}
    if dupes:
        # two inputs collapsing to one normalized word would silently
        # DOUBLE that word's contribution to every score (round-8 pass)
        raise ValueError(
            f"query terms normalize to duplicates {sorted(dupes)} — "
            "deduplicate the term list (each would be scored twice)"
        )
    query_terms = normed
    c_id, c_txt = F.col(id_col), F.col(text_col)
    # array_remove of the "" that split() emits for empty input: a
    # wordless doc must not count one phantom token toward its length
    # (it then has no row here at all — it can't match any term, and
    # bm25's avglen is documented over word-bearing docs)
    words = df.select(
        c_id.alias("id"),
        F.explode(
            F.array_remove(
                F.split(normalized_text(F.coalesce(c_txt, F.lit(""))), " "), ""
            )
        ).alias("w"),
    )
    return words.groupBy("id").agg(
        F.count(F.lit(1)).alias("len"),
        *[
            F.count_if(F.col("w") == term).alias(f"__tf_{i}")
            for i, term in enumerate(query_terms)
        ],
    )


def _any_term_matched(k: int) -> Column:
    """Filter: at least one of the k ``__tf_i`` columns is positive.
    (``F.greatest`` requires >= 2 columns, so k == 1 compares directly.)"""
    cols = [F.col(f"__tf_{i}") for i in range(k)]
    return (cols[0] if k == 1 else F.greatest(*cols)) > 0


def tfidf_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    log_idf: bool = False,
    fp_scale: int = 1_000_000,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document TF-IDF relevance for a bag of query terms.

    Pipeline: the single-pass columnar per-doc core
    (:func:`_per_doc_term_counts` — one normalization, one explode, one
    doc-keyed shuffle) → ONE broadcast row of per-term doc frequencies →
    per-term fixed-point scores summed in a projection.

    idf defaults to the *rational* form (N+1)/(df+1), whose IEEE division
    is bit-identical across engines (a SQL oracle can reproduce it
    exactly); ``log_idf=True`` applies ln() on top for the classical
    weighting (engine-exactness of libm log is not guaranteed — keep it
    out of oracle-checked paths).

    Scale: at 100 TB the only corpus-sized exchange is the per-doc
    partial aggregate; doc-frequency and N are 1-row aggregates that
    broadcast. The per-doc table (#docs rows — tiny next to the corpus)
    is persisted so the df-stats row and the score projection share ONE
    explode pass instead of each re-running the corpus scan (measured
    2x on the 100x fixture); the per-term score is a horizontal
    expression sum over the term columns — no stack, no join on the
    term key, no second per-doc aggregation. The cache entry joins the
    bounded operator-cache LRU (``_cache.register_cached``), so
    long-lived sessions cycling many term sets don't accumulate pinned
    entries.
    """
    from cassandra_analytics_spark.operators._cache import register_cached

    k = len(query_terms)
    per_doc = _per_doc_term_counts(df, query_terms, id_col, text_col).persist()
    register_cached(per_doc)
    dstats = per_doc.agg(
        *[F.count_if(F.col(f"__tf_{i}") > 0).alias(f"__df_{i}") for i in range(k)]
    )
    # ``stats_df``: frame for the corpus count N (defaults to ``df``).
    # When the caller spreads ``df`` for the explode-heavy pass (a
    # repartition in the plan), passing the RAW scan here keeps the
    # count metadata-only (parquet aggregate pushdown) — a count through
    # a Repartition node must materialize the exchange (r16).
    n_src = stats_df if stats_df is not None else df
    n_docs = n_src.select(F.count(F.lit(1)).alias("n"))  # metadata-only scan

    def contrib(i: int) -> Column:
        idf = (F.col("n") + 1).cast("double") / (F.col(f"__df_{i}") + 1)
        if log_idf:
            idf = F.log(idf)
        term_score = (F.col(f"__tf_{i}").cast("double") / F.col("len")) * idf
        return F.floor(term_score * fp_scale + F.lit(0.5))

    matched = per_doc.filter(_any_term_matched(k))
    total = contrib(0)
    for i in range(1, k):
        total = total + contrib(i)
    return (
        matched.join(F.broadcast(dstats))
        .join(F.broadcast(n_docs))
        .select(
            F.col("id").alias(id_col),
            (total.cast("double") / fp_scale).alias("score"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    fp_scale: int | None = None,
) -> DataFrame:
    """Okapi BM25 relevance: same distributed shape as
    :func:`tfidf_scores` (single-pass columnar per-doc core, persisted;
    df/N/avglen collapse to one broadcast row; per-term scores summed in
    a projection) with saturating tf and length normalization:

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avglen))

    ``fp_scale`` makes the result engine-exact (oracle-checkable): the
    idf is rounded to 1/fp_scale immediately after the ln (libm's last
    ulp leaves the comparison), every other operation is IEEE-754
    exact-rounded arithmetic on identical expression trees, and the
    per-doc term sum runs over fixed-point BIGINTs, whose addition is
    order-independent (float summation order is not deterministic under
    parallel aggregation). Without ``fp_scale`` raw doubles are
    returned (not oracle-safe).
    """
    from cassandra_analytics_spark.operators._cache import register_cached

    k = len(query_terms)
    per_doc = _per_doc_term_counts(df, query_terms, id_col, text_col).persist()
    register_cached(per_doc)
    # one broadcast row: N, avglen (over docs that produced words — same
    # population as a words-derived doclen CTE) and every term's df.
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("len").alias("avglen"),
        *[F.count_if(F.col(f"__tf_{i}") > 0).alias(f"__df_{i}") for i in range(k)],
    )

    def term_score(i: int) -> Column:
        tf_i, df_i = F.col(f"__tf_{i}"), F.col(f"__df_{i}")
        idf = F.log(1.0 + (F.col("n") - df_i + 0.5) / (df_i + 0.5))
        if fp_scale is not None:
            idf = F.floor(idf * fp_scale + F.lit(0.5)) / fp_scale
        denom = tf_i + k1 * (1.0 - b + b * F.col("len") / F.col("avglen"))
        return idf * tf_i * (k1 + 1.0) / denom

    matched = per_doc.filter(_any_term_matched(k))
    if fp_scale is not None:
        total = F.floor(term_score(0) * fp_scale + F.lit(0.5))
        for i in range(1, k):
            total = total + F.floor(term_score(i) * fp_scale + F.lit(0.5))
        score = (total.cast("double") / fp_scale).alias("score")
    else:
        total = term_score(0)
        for i in range(1, k):
            total = total + term_score(i)
        score = total.alias("score")
    return matched.join(F.broadcast(stats)).select(
        F.col("id").alias(id_col), score
    )


def reciprocal_rank_fusion(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of several
    ranked retrieval lists: ``fused(d) = Σ_lists 1/(k + rank_list(d))``.

    The hybrid-retrieval primitive a training-data mining pipeline uses
    to combine lexical (BM25) and semantic (embedding-cosine) hits: RRF
    needs no score calibration between the lists — only ranks — and k=60
    is the paper's robust default.

    Engine-exact by construction: each contribution is the INTEGER
    ``scale DIV (k + rank)`` and the fusion is a BIGINT sum — pure
    integer math, order-independent under parallel aggregation, bit-equal
    in any engine (no float reciprocal sums to drift). Output:
    ``(id, rrf_fp, n_lists)`` where ``rrf_fp`` is the fused score in
    fixed-point (divide by ``scale`` for the paper's value) and
    ``n_lists`` counts the lists the doc appeared in.

    Ranks are 1-based; NULL or non-positive ranks are dropped from a
    list before fusion (a 0/negative rank would hit DIV-by-zero or flip
    the score's sign deep inside the job), and a doc appearing at SEVERAL
    ranks within one list contributes only its best (smallest) rank — an
    un-deduped upstream list would otherwise double-count the doc's
    contribution AND inflate ``n_lists`` past the number of lists
    (round-8 review). Scale shape: the inputs are top-k lists (tiny by
    construction), so the per-list dedup + union + single groupBy is
    bounded by Σ list sizes, never corpus size.
    """
    from functools import reduce

    if not ranked:
        raise ValueError("reciprocal_rank_fusion needs at least one ranked list")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    # a NULL id is corrupt retrieval output — it would fuse into its own
    # phantom result row (NULL groups like any value in groupBy), silently
    # displacing a real doc from the final top-k (round-9 executed
    # probe). Fail loudly at the offending row, like every other id-keyed
    # verdict path in the repo.
    guarded_id = F.when(
        F.col(id_col).isNotNull(), F.col(id_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"reciprocal_rank_fusion: NULL {id_col!r} in a ranked "
                "list — rank lists must carry non-NULL ids"
            )
        )
    )
    # filter BEFORE the select: filtering on rank_col after projecting it
    # away only worked via the analyzer's missing-reference resolution and
    # broke with an ambiguity error whenever a caller's list already had a
    # column named '__r' (round-9 ADVICE)
    parts = [
        df.filter(F.col(rank_col).isNotNull() & (F.col(rank_col) >= 1))
        .select(
            guarded_id.alias(id_col),
            F.col(rank_col).cast("long").alias("__r"),
        )
        .groupBy(id_col)
        .agg(F.min("__r").alias("__r"))
        for df in ranked.values()
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    contrib = F.expr(f"CAST({int(scale)} AS BIGINT) DIV (CAST({int(k)} AS BIGINT) + __r)")
    return u.groupBy(id_col).agg(
        F.sum(contrib).alias("rrf_fp"),
        F.count(F.lit(1)).alias("n_lists"),
    )


def remove_repeated_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Intra-document repetition removal (the C4/Gopher cleanup twin of
    :func:`repetition_stats`): drop repeated segments WITHIN each
    document, keeping the first occurrence in original order.

    Segments are the text split on the literal ``sep`` (newline for
    line-dedup, space for token streams); empty segments (consecutive
    separators, leading/trailing) are dropped — the phantom-empty-token
    lesson from the round-8 text pass. Returns one row per input
    document: ``(id, text_col (cleaned), n_segments, n_removed)`` —
    NULL/empty texts survive with NULL cleaned text and zero counts
    instead of vanishing through the explode.

    Scale shape: ONE explode → two chained (id, segment)-then-(id) keyed
    aggregations → one join back on id. ``n_segments`` is a row-local
    expression on the original frame (array size after the empty filter),
    NOT a second aggregation over the exploded subplan — the first cut
    re-ran the full split+explode and shuffled it a second time just to
    count segments (round-8 review). Per-doc state (the collect_list) is
    bounded by document length, never corpus size; everything is built-in
    expressions, no Python in the hot path.
    """
    import re as _re

    if not sep:
        raise ValueError("sep must be a non-empty separator string")
    pat = _re.escape(sep)
    seg_array = F.filter(F.split(F.col(text_col), pat), lambda x: x != "")
    segs = df.select(
        F.col(id_col),
        F.posexplode(seg_array).alias("__pos", "__seg"),
    )
    firsts = segs.groupBy(id_col, "__seg").agg(F.min("__pos").alias("__pos"))
    clean = firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                lambda s: s["__seg"],
            ),
            sep,
        ).alias("__clean"),
        F.count(F.lit(1)).alias("__kept"),
    )
    return (
        df.select(
            F.col(id_col),
            F.coalesce(F.size(seg_array), F.lit(0)).cast("long").alias("__nseg"),
        )
        .join(clean, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__clean").alias(text_col),
            F.col("__nseg").alias("n_segments"),
            (
                F.col("__nseg") - F.coalesce(F.col("__kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )
