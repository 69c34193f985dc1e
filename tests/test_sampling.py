"""hash_split stability invariants — the properties that make an id-hash
split safe for training pipelines (SURVEY north-star: training-data ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_spark.catalog import load_table
from cassandra_analytics_spark.operators.sampling import hash_split, stratified_sample


def test_split_is_deterministic_and_partition_independent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in hash_split(d).select("doc_id", "split").collect()}
    # different physical partitioning must not change any assignment
    b = {
        r.doc_id: r.split
        for r in hash_split(d.repartition(7)).select("doc_id", "split").collect()
    }
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}


def test_split_proportions_roughly_match(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    counts = {
        r.split: r.n
        for r in hash_split(d).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert total == d.count()
    # 2^16-bucket md5 hash is uniform; at >=1000 docs the 80/10/10 split
    # should land within a few points
    assert abs(counts["train"] / total - 0.80) < 0.05
    assert abs(counts["val"] / total - 0.10) < 0.04
    assert abs(counts["test"] / total - 0.10) < 0.04


def test_split_is_a_pure_projection(spark, sf_dir):
    # no Exchange in the plan: assignment must be computable row-local
    import contextlib
    import io

    d = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_split(d).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stratified_sample_seed_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5, "it": 0.5}
    a = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, seed=7).collect())
    b = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, seed=7).collect())
    assert a == b
    assert 0 < len(a) < d.count()


def test_stratified_hash_sample_deterministic_and_exact(spark, sf_dir):
    from cassandra_analytics_spark.operators.sampling import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "fr": 0.25, "zh": 0.1}
    a = sorted(r.doc_id for r in stratified_hash_sample(d, "lang", "doc_id", fr).collect())
    # partitioning must not change membership (no RNG state)
    b = sorted(
        r.doc_id
        for r in stratified_hash_sample(d.repartition(7), "lang", "doc_id", fr).collect()
    )
    assert a == b and 0 < len(a) < d.count()
    # unlisted strata sample at 0
    langs = {
        r.lang
        for r in stratified_hash_sample(d, "lang", "doc_id", fr).select("lang").distinct().collect()
    }
    assert langs <= {"en", "fr", "zh"}


def test_stratified_hash_sample_noninteger_percent_matches_predicate(spark):
    """Non-integer percents follow the documented rule md5(id)%100 <
    frac*100 exactly: 0.125 keeps buckets 0..12 (13 of 100), and binary
    float noise (0.1*100 == 10.000000000000002) must not leak bucket 10
    into a 10% sample."""
    import hashlib

    from cassandra_analytics_spark.operators.sampling import stratified_hash_sample

    rows = [(i, "en") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    # expected integer bucket thresholds for the documented predicate
    # (computed exactly — `frac * 100` in the test itself would carry
    # the very float noise the implementation must strip)
    for frac, thr in ((0.125, 13), (0.1, 10)):
        got = sorted(
            r.doc_id
            for r in stratified_hash_sample(df, "lang", "doc_id", {"en": frac}).collect()
        )
        want = sorted(i for i, _ in rows if bucket(i) < thr)
        assert got == want, f"frac={frac}"


def test_stratified_hash_sample_is_pure_filter(spark, sf_dir):
    import contextlib
    import io

    from cassandra_analytics_spark.operators.sampling import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stratified_hash_sample(d, "lang", "doc_id", {"en": 0.5}).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stratified_hash_sample_langs_matches_oracle(spark, sf_dir):
    from cassandra_analytics_spark.testing import compare_query

    res = compare_query("stratified_hash_sample_langs", spark, sf_dir)
    assert res.ok, str(res)


def test_stratified_sample_langs_plan_has_no_driver_jobs(spark):
    """Building the registered query's DataFrame must not launch any Spark
    job (the round-1 version collect()ed distinct strata per query)."""
    from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    import inspect

    from cassandra_analytics_spark.operators.sampling import stratified_sample

    # the query function must not enumerate strata with a driver action
    src = inspect.getsource(REGISTRY["stratified_sample_langs"].fn)
    assert ".collect()" not in src and ".distinct()" not in src

    # and the sampling operator itself is a pure projection: building the
    # plan over an in-memory df launches zero Spark jobs (parquet scans
    # account for their own footer-inference job, measured separately)
    base = spark.createDataFrame(
        [(i, ["de", "en", "es"][i % 3]) for i in range(30)], "id long, lang string"
    )
    all_before = spark._jsc.sc().dagScheduler().nextJobId()
    df = stratified_sample(base, "lang", {"de": 0.5, "en": 0.5, "es": 0.5})
    all_after = spark._jsc.sc().dagScheduler().nextJobId()
    assert all_after == all_before, "plan construction launched a Spark job"
    assert df.schema is not None


def test_hash_split_null_id_and_pct_validation(spark):
    """Round-8 hostile pass: a NULL id used to fall through every
    when() branch into 'test' — an accidental assignment; it is now a
    visible NULL split. Bad percent combos raise."""
    import pytest

    from cassandra_analytics_spark.operators.sampling import (
        hash_split,
        stratified_hash_sample,
    )

    df = spark.createDataFrame([(None,), ("d1",)], "doc_id string")
    got = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert got[None] is None
    assert got["d1"] in ("train", "val", "test")

    with pytest.raises(ValueError, match="train_pct"):
        hash_split(df, train_pct=80, val_pct=30)
    with pytest.raises(ValueError, match="fractions"):
        stratified_hash_sample(df, "doc_id", "doc_id", {"x": 1.5})


def test_mixture_sample_ratios_and_determinism(spark):
    """mixture_sample: the kept corpus follows the target ratios (binding
    domain keeps everything), membership is id-stable, unweighted and
    zero-weighted domains are dropped."""
    from cassandra_analytics_spark.operators.sampling import mixture_sample

    rows = [(i, "a", 10) for i in range(400)]          # 4000 units
    rows += [(1000 + i, "b", 10) for i in range(100)]  # 1000 units (binding)
    rows += [(2000 + i, "c", 10) for i in range(300)]  # unweighted
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    kept = mixture_sample(
        df, {"a": 0.5, "b": 0.5, "c": 0.0}, size_col="n_chars"
    )
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "c" not in by_lang                      # zero weight -> dropped
    assert by_lang["b"] == 100                     # binding domain keeps all
    # target for a = 1000 units = 100 docs; hash sampling is approximate
    assert 80 <= by_lang["a"] <= 120
    # determinism: same call, same membership
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in mixture_sample(
        df, {"a": 0.5, "b": 0.5, "c": 0.0}, size_col="n_chars").collect())
    assert ids1 == ids2
    # a kept id stays kept when the corpus grows (id-hash stability)
    grown = df.unionByName(spark.createDataFrame(
        [(5000 + i, "b", 10) for i in range(100)],
        "doc_id long, lang string, n_chars long"))
    kept_grown = set(r.doc_id for r in mixture_sample(
        grown, {"a": 0.5, "b": 0.5}, size_col="n_chars").collect())
    # b now has 2000 units -> a's fraction rises; previously-kept a docs
    # must remain kept (threshold only moved up)
    assert set(ids1) <= kept_grown

    # total cap halves the mixture
    capped = mixture_sample(
        df, {"a": 0.5, "b": 0.5}, size_col="n_chars", total=1000.0)
    n = capped.count()
    assert 80 <= n <= 120  # ~50 docs per domain


def test_mixture_sample_validation(spark):
    """Degenerate mixtures fail eagerly with named errors."""
    import pytest

    from cassandra_analytics_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "a", 5)], "doc_id long, lang string, n_chars long"
    )
    with pytest.raises(ValueError, match="at least one weighted domain"):
        mixture_sample(df, {})
    with pytest.raises(ValueError, match=">= 0"):
        mixture_sample(df, {"a": -0.5})
    with pytest.raises(ValueError, match="all mixture weights are zero"):
        mixture_sample(df, {"a": 0.0})
    with pytest.raises(ValueError, match="total must be > 0"):
        mixture_sample(df, {"a": 1.0}, total=0)
    with pytest.raises(ValueError, match="no data"):
        mixture_sample(df, {"a": 0.5, "nope": 0.5})


def test_mixture_sample_round9_probe_hardening(spark):
    """Round-9 executed probes: inf weights used to die as a cryptic
    ZeroDivisionError (normalizing siblings to 0), NaN weights were
    misreported as 'all weights are zero', and NULL/negative size values
    silently distorted the achievable mixture (a negative domain total
    even turned X negative, keeping nothing with no error)."""
    import pytest

    from cassandra_analytics_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 7), (3, "b", 4)],
        "doc_id long, lang string, n_chars long",
    )
    with pytest.raises(ValueError, match="finite"):
        mixture_sample(df, {"a": float("inf"), "b": 1.0})
    with pytest.raises(ValueError, match="finite"):
        mixture_sample(df, {"a": float("nan")})

    bad_sz = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None), (3, "b", -4), (4, "b", 9)],
        "doc_id long, lang string, n_chars long",
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        mixture_sample(bad_sz, {"a": 1.0}, size_col="n_chars")
    with pytest.raises(ValueError, match="NULL or negative"):
        mixture_sample(bad_sz, {"b": 1.0}, size_col="n_chars")
    # corrupt sizes OUTSIDE the weighted domains don't matter; and the
    # row-count path (size_col=None) never inspects sizes at all
    assert mixture_sample(
        bad_sz.filter("doc_id != 2"), {"a": 1.0}, size_col="n_chars"
    ).count() == 1
    assert mixture_sample(bad_sz, {"a": 1.0}).count() == 2
