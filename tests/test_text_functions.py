"""Unit tests for the text-analysis column functions."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.text import (
    bpe_token_count,
    fingerprint,
    language_id,
    normalized_text,
    quality_features,
    token_count,
)


def _vals(spark, texts, expr):
    df = spark.createDataFrame([Row(t=x) for x in texts])
    return [r.o for r in df.select(expr.alias("o")).collect()]


def test_token_count_edges(spark):
    got = _vals(
        spark,
        ["one two three", "", "   ", "single", "a  b\t c"],
        token_count(F.col("t")),
    )
    assert got == [3, 0, 0, 1, 3]


def test_bpe_token_count(spark):
    got = _vals(spark, ["hello world42!", "a,b"], bpe_token_count(F.col("t")))
    # hello | world | 42 | !  /  a | , | b
    assert got == [4, 3]


def test_language_id_markers(spark):
    got = _vals(
        spark,
        [
            "the cat and the dog is here",
            "der hund und die katze ist nicht da",
            "le chat et la souris est ici",
            "xyzzy plugh",
        ],
        language_id(F.col("t")),
    )
    assert got == ["en", "de", "fr", "unknown"]


def test_fingerprint_algorithms(spark):
    md5s = _vals(spark, ["abc"], fingerprint(F.col("t"), "md5"))
    assert md5s == ["900150983cd24fb0d6963f7d28e17f72"]  # published md5("abc")
    sha = _vals(spark, ["abc"], fingerprint(F.col("t"), "sha256"))
    assert sha[0].startswith("ba7816bf")  # published sha256("abc") prefix
    xx = _vals(spark, ["abc", "abc"], fingerprint(F.col("t"), "xxhash64"))
    assert xx[0] == xx[1]


def test_normalized_text(spark):
    got = _vals(spark, ["  Hello,   WORLD!! 123 "], normalized_text(F.col("t")))
    assert got == ["hello world 123"]


def test_quality_features_schema(spark):
    df = spark.createDataFrame([Row(text="Hello World 42.")])
    out = quality_features(df).collect()[0]
    assert out.q_chars == 15
    assert out.q_tokens == 3
    assert out.q_punct_ratio > 0
    assert out.q_upper_ratio == 2 / 15
    assert out.q_digit_ratio == 2 / 15


def test_tfidf_log_idf_ranks_rarer_terms_higher(spark):
    from cassandra_analytics_spark.operators.text import tfidf_scores

    docs = spark.createDataFrame(
        [
            (1, "rare common common common"),
            (2, "common common common common"),
            (3, "word word word word"),
        ],
        ["doc_id", "text"],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in tfidf_scores(docs, ["rare", "common"], log_idf=True).collect()
    }
    # doc 3 has no query term → no row; doc 1 holds the only 'rare' token
    # → beats doc 2 even though doc 2 is pure 'common'
    assert set(scores) == {1, 2}
    assert scores[1] > scores[2] > 0.0


def test_scorers_accept_a_single_query_term(spark):
    """Regression: the columnar scorer core used F.greatest over the
    per-term columns, which requires >= 2 columns — a one-term query
    crashed at DataFrame-build time."""
    from cassandra_analytics_spark.operators.text import bm25_scores, tfidf_scores

    docs = spark.createDataFrame(
        [(1, "rare word word"), (2, "word word word")],
        ["doc_id", "text"],
    )
    tf = {r["doc_id"]: r["score"] for r in tfidf_scores(docs, ["rare"]).collect()}
    bm = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["rare"]).collect()}
    assert set(tf) == {1} and tf[1] > 0.0
    assert set(bm) == {1} and bm[1] > 0.0


def test_bm25_saturates_and_length_normalizes(spark):
    from cassandra_analytics_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "rare common common common"),
            (2, "common common common common"),
            (3, "word word word word"),
            (4, "rare word word word word word word word word word word word"),
        ],
        ["doc_id", "text"],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["rare", "common"]).collect()
    }
    assert set(scores) == {1, 2, 4}
    # doc 1: rare + 3x common beats everything; long doc 4 is
    # length-penalized below doc 1 despite also holding 'rare'
    assert scores[1] > scores[4]
    assert scores[1] > scores[2] > 0.0


def test_repetition_stats_flags_degenerate_text(spark):
    from cassandra_analytics_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    # degenerate doc: one distinct word, every bigram a repeat
    assert got[1].n_tokens == 6
    assert got[1].distinct_ratio == 1 / 6
    assert got[1].top_word_ratio == 1.0
    assert got[1].dup_bigram_ratio == 4 / 5
    # healthy doc: all words distinct, no repeated bigrams
    assert got[2].distinct_ratio == 1.0
    assert got[2].dup_bigram_ratio == 0.0
    # single-token doc: no bigrams → ratio 0, no div-by-zero
    assert got[3].n_tokens == 1
    assert got[3].dup_bigram_ratio == 0.0


def test_contamination_overlap_flags_leaked_docs(spark):
    from cassandra_analytics_spark.operators.dedup import contamination_overlap

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris and it is large")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "quiz answer the capital of france is paris obviously"),
            (2, "completely unrelated text about gardening and soil"),
        ],
        "doc_id long, text string",
    )
    flagged = {
        r.doc_id: r.n_overlap
        for r in contamination_overlap(
            corpus, bench, shingle_n=3, min_overlap=2
        ).collect()
    }
    assert 1 in flagged and flagged[1] >= 2  # leaked doc caught
    assert 2 not in flagged  # clean doc passes


def test_scorer_terms_are_normalized_like_the_corpus(spark):
    """'The' must match corpus word 'the' (corpus words are normalized);
    a term that normalizes to several words or nothing raises."""
    import pytest

    from cassandra_analytics_spark.operators.text import tfidf_scores

    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "no articles here")], ["doc_id", "text"]
    )
    scores = {r.doc_id: r.score for r in tfidf_scores(docs, ["The"]).collect()}
    assert set(scores) == {1} and scores[1] > 0.0
    with pytest.raises(ValueError, match="single word"):
        tfidf_scores(docs, ["two words"]).collect()
    with pytest.raises(ValueError, match="single word"):
        tfidf_scores(docs, ["!!!"]).collect()


def test_text_layer_null_and_wordless_docs_uniform(spark):
    """Round-8 hostile pass: NULL / empty / punctuation-only docs used to
    get three different answers across the text layer — NULL counts from
    token_count, a dropped row from repetition_stats (NULL text) or a
    PHANTOM token (n_tokens=1 for '!!!'), and a NULL/0.0 mix from
    quality_features. The uniform contract: NULL text is empty text;
    wordless docs report zero tokens and 0.0 ratios, and every input doc
    gets a feature row."""
    from cassandra_analytics_spark.operators.text import (
        bpe_token_count,
        punct_count,
        quality_features,
        repetition_stats,
        token_count,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "!!! ..."), (4, "real words here")],
        "doc_id long, text string",
    )
    counts = {
        r.doc_id: (r.tc, r.bpe, r.pc)
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            bpe_token_count("text").alias("bpe"),
            punct_count("text").alias("pc"),
        ).collect()
    }
    # punct_count included since round-8 review: it was the one counter
    # still answering NULL for NULL text
    assert counts[1] == (0, 0, 0)
    assert counts[2] == (0, 0, 0)
    assert counts[3] == (2, 6, 6)  # whitespace tokens vs single-symbol BPE
    assert counts[4] == (3, 3, 0)

    rep = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert set(rep) == {1, 2, 3, 4}  # every doc gets a row
    for d in (1, 2, 3):
        assert rep[d].n_tokens == 0
        assert rep[d].distinct_ratio == 0.0
        assert rep[d].top_word_ratio == 0.0
        assert rep[d].dup_bigram_ratio == 0.0
    assert rep[4].n_tokens == 3 and rep[4].distinct_ratio == 1.0

    q = {r.doc_id: r for r in quality_features(df).collect()}
    assert q[1].q_chars == 0 and q[1].q_tokens == 0
    assert q[1].q_mean_token_len == 0.0 and q[1].q_punct_ratio == 0.0


def test_tfidf_rejects_duplicate_terms_and_skips_wordless_docs(spark):
    import pytest

    from cassandra_analytics_spark.operators.text import (
        bm25_scores,
        tfidf_scores,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "!!!"), (3, None), (4, "alpha alpha")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="duplicates"):
        tfidf_scores(df, ["alpha", "Alpha!"])  # both normalize to 'alpha'

    # wordless docs contribute no phantom length and can't match
    got = {r.doc_id for r in tfidf_scores(df, ["alpha"]).collect()}
    assert got == {1, 4}
    got = {r.doc_id for r in bm25_scores(df, ["alpha"], fp_scale=10**6).collect()}
    assert got == {1, 4}


def test_contamination_benchmark_needs_only_text(spark):
    """Round-8 probe pass: the benchmark side used to require the
    CORPUS's id column (an eval set with its own id naming failed with
    UNRESOLVED_COLUMN) even though only its text is used. Flags must be
    identical whatever the benchmark's id column is called — or whether
    it has one at all."""
    from cassandra_analytics_spark.operators.dedup import contamination_overlap

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark execution plans"),
        ],
        "doc_id long, text string",
    )
    flagged = [
        (r.doc_id, r.n_overlap)
        for r in contamination_overlap(
            corpus,
            spark.createDataFrame(
                [(99, "the quick brown fox jumps over the lazy dog")],
                "eval_id long, text string",
            ),
            min_overlap=3,
        ).collect()
    ]
    assert flagged == [(1, 7)]
    # text-only benchmark works too, same answer
    flagged2 = [
        (r.doc_id, r.n_overlap)
        for r in contamination_overlap(
            corpus,
            spark.createDataFrame(
                [("the quick brown fox jumps over the lazy dog",)],
                "text string",
            ),
            min_overlap=3,
        ).collect()
    ]
    assert flagged2 == [(1, 7)]


def test_reciprocal_rank_fusion(spark):
    """RRF: integer fixed-point contributions, docs in several lists sum
    their reciprocals, NULL/non-positive ranks are dropped, degenerate
    parameters fail eagerly."""
    import pytest

    from cassandra_analytics_spark.operators.text import reciprocal_rank_fusion

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, None), (4, 0)], "doc_id long, rank int"
    )
    b = spark.createDataFrame([(1, 2), (5, 1)], "doc_id long, rank int")
    out = {
        r.doc_id: (r.rrf_fp, r.n_lists)
        for r in reciprocal_rank_fusion({"a": a, "b": b}).collect()
    }
    # 1_000_000 DIV 61 = 16393, DIV 62 = 16129
    assert out[1] == (16393 + 16129, 2)
    assert out[2] == (16129, 1)
    assert out[5] == (16393, 1)
    assert 3 not in out and 4 not in out  # NULL / 0 ranks dropped

    with pytest.raises(ValueError, match="at least one ranked list"):
        reciprocal_rank_fusion({})
    with pytest.raises(ValueError, match="k must be >= 0"):
        reciprocal_rank_fusion({"a": a}, k=-1)
    with pytest.raises(ValueError, match="scale must be >= 1"):
        reciprocal_rank_fusion({"a": a}, scale=0)

    # round-9 ADVICE: the rank filter used to run AFTER the select had
    # projected rank_col away — it only resolved via the analyzer's
    # missing-reference fallback and died with an ambiguity error when a
    # caller's list already carried a column named '__r'
    collide = spark.createDataFrame(
        [(1, 1, 99), (6, 3, 98)], "doc_id long, rank int, __r int"
    )
    out2 = {
        r.doc_id: (r.rrf_fp, r.n_lists)
        for r in reciprocal_rank_fusion({"a": collide, "b": b}).collect()
    }
    assert out2[1] == (16393 + 16129, 2)
    assert out2[6] == (1_000_000 // 63, 1)
    # rank_col literally named '__r' also works
    named = spark.createDataFrame([(7, 1)], "doc_id long, __r int")
    out3 = reciprocal_rank_fusion({"a": named}, rank_col="__r").collect()
    assert (out3[0].doc_id, out3[0].rrf_fp) == (7, 16393)


def test_remove_repeated_segments(spark):
    """Intra-doc repetition removal: first occurrence wins in original
    order, empty segments dropped, NULL/empty docs survive with zero
    counts, and a custom separator works literally (no regex surprises)."""
    import pytest

    from cassandra_analytics_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame(
        [
            (1, "a b a c b a"),
            (2, "x  x"),          # double separator -> empty segment dropped
            (3, None),
            (4, ""),
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_segments(df).collect()}
    assert (out[1].text, out[1].n_segments, out[1].n_removed) == ("a b c", 6, 3)
    assert (out[2].text, out[2].n_segments, out[2].n_removed) == ("x", 2, 1)
    assert (out[3].text, out[3].n_segments, out[3].n_removed) == (None, 0, 0)
    assert (out[4].text, out[4].n_segments, out[4].n_removed) == (None, 0, 0)
    assert (out[5].text, out[5].n_segments, out[5].n_removed) == ("solo", 1, 0)

    # literal separator with a regex metacharacter
    dots = spark.createDataFrame([(1, "a.b.a")], "doc_id long, text string")
    r = remove_repeated_segments(dots, sep=".").collect()[0]
    assert (r.text, r.n_segments, r.n_removed) == ("a.b", 3, 1)

    with pytest.raises(ValueError, match="non-empty separator"):
        remove_repeated_segments(df, sep="")


def test_reciprocal_rank_fusion_null_ids_are_loud(spark):
    """Round-9 executed probe: a NULL id in a ranked list used to fuse
    into its own phantom result row, silently displacing a real doc from
    the final top-k. Corrupt retrieval output now raises at the row."""
    import pytest

    from cassandra_analytics_spark.operators.text import reciprocal_rank_fusion

    bad = spark.createDataFrame([(None, 1), (2, 2)], "doc_id long, rank int")
    with pytest.raises(Exception, match="non-NULL ids"):
        reciprocal_rank_fusion({"a": bad}).collect()


def test_contamination_bloom_equals_exact_even_with_forced_fps(spark):
    """Round-10: the Bloom-prefiltered decontamination path must be
    bit-identical to the exact broadcast path — the exact-join confirm
    absorbs every false positive, pinned here with num_bits=64 (a
    saturated bitmap, so nearly EVERY corpus shingle survives the
    prefilter) and at a realistic size. Empty benchmarks yield empty
    results, and degenerate num_bits is a named error."""
    import pytest

    from cassandra_analytics_spark.operators.dedup import (
        contamination_overlap,
        contamination_overlap_bloom,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different text with no shared phrases at all"),
            (3, "the quick brown fox jumps over something else entirely"),
            (97, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 97")
    corpus = docs.filter("doc_id <> 97")

    want = {
        (r.doc_id, r.n_overlap)
        for r in contamination_overlap(
            corpus, bench, shingle_n=3, min_overlap=2
        ).collect()
    }
    assert want  # doc 1 (and maybe 3) overlap the benchmark
    for m in (64, 1 << 20):
        got = {
            (r.doc_id, r.n_overlap)
            for r in contamination_overlap_bloom(
                corpus, bench, shingle_n=3, min_overlap=2, num_bits=m
            ).collect()
        }
        assert got == want, f"num_bits={m}"

    assert (
        contamination_overlap_bloom(
            corpus, bench.filter("doc_id < 0"), min_overlap=1
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="num_bits"):
        contamination_overlap_bloom(corpus, bench, num_bits=32)


def test_contamination_bloom_lifecycle_and_jvm_membership(spark):
    """Round-11 (VERDICT r10 item 4, resolved by construction): the Bloom
    membership test is two JVM broadcast joins on the word table — no
    Python-side broadcast or driver bitmap exists, so 20 sequential
    calls accumulate NOTHING (no handle to leak) and return identical
    results; the executed plan must show the broadcast joins and zero
    Python UDFs (the round-10 pandas-UDF probe measured 2.7x slower at
    100x, PERF.md)."""
    from cassandra_analytics_spark.operators.dedup import (
        contamination_overlap_bloom,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different text with no shared phrases at all"),
            (97, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 97")
    corpus = docs.filter("doc_id <> 97")

    results = []
    for _ in range(20):
        flagged = contamination_overlap_bloom(
            corpus, bench, shingle_n=3, min_overlap=2, num_bits=64
        )
        results.append(
            sorted((r.doc_id, r.n_overlap) for r in flagged.collect())
        )
    assert all(r == results[0] for r in results) and results[0]

    plan = contamination_overlap_bloom(
        corpus, bench, shingle_n=3, min_overlap=2
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
