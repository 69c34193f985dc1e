"""Cassandra-semantics checks over the persistent B/C fixtures — the
reference's golden-oracle pattern: engine output vs an independent DuckDB
window-query oracle on the same parquet."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_analytics_spark.fixtures import NOW_MICROS, ensure_fixtures
from cassandra_analytics_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
)
from cassandra_analytics_spark.operators.merge import (
    compaction_merge,
    propagate_static_columns,
)

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")


@pytest.fixture(scope="module")
def fixtures() -> str:
    return ensure_fixtures(FIXTURE_DIR)


def test_multiversion_lww_vs_oracle(spark, fixtures):
    df = spark.read.parquet(os.path.join(fixtures, "multiversion.parquet"))
    merged = compaction_merge(df, ["pk"], ["ck"], now_micros=NOW_MICROS)
    got = {(r.pk, r.ck): r.val for r in merged.collect()}

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT pk, ck, val FROM (
            SELECT pk, ck, val,
                   ROW_NUMBER() OVER (PARTITION BY pk, ck
                                      ORDER BY writetime DESC, val DESC) AS rn
            FROM '{fixtures}/multiversion.parquet'
        ) WHERE rn = 1
        """
    ).fetchall()
    want = {(pk, ck): val for pk, ck, val in oracle}
    assert got == want
    assert len(got) == 5_000  # one winner per key


def test_tombstones_purged(spark, fixtures):
    df = spark.read.parquet(os.path.join(fixtures, "tombstones.parquet"))
    merged = compaction_merge(df, ["pk"], ["ck"], now_micros=NOW_MICROS)
    out = merged.collect()
    # no tombstoned or expired row may survive
    raw = df.toPandas()
    dead_keys = set()
    for _, r in raw.iterrows():
        if r["tombstone"] == "row" or (r["ttl"] == 1):
            dead_keys.add((r["pk"], r["ck"]))
    survivors = {(r.pk, r.ck) for r in out}
    # row-tombstoned keys whose tombstone is newest must be gone
    for pk, ck in dead_keys:
        versions = raw[(raw.pk == pk) & (raw.ck == ck)]
        newest = versions.loc[versions.writetime.idxmax()]
        if newest["tombstone"] == "row" or newest["ttl"] == 1:
            assert (pk, ck) not in survivors
    # cell tombstones: val nulled where tombstone newest
    cell_pks = raw[raw.tombstone == "cell:val"][["pk", "ck"]]
    nulled = {(r.pk, r.ck): r.val for r in out}
    for _, r in cell_pks.iterrows():
        key = (r["pk"], r["ck"])
        if key in nulled:
            assert nulled[key] is None


def test_static_propagation_fixture(spark, fixtures):
    df = spark.read.parquet(os.path.join(fixtures, "static_cols.parquet"))
    out = propagate_static_columns(df, ["pk"], ["s"])
    pdf = out.toPandas()
    per_pk = pdf.groupby("pk")["s"].nunique(dropna=False)
    # after propagation every partition has exactly one distinct s value
    assert (per_pk == 1).all()
    with_static = pdf[pdf.s.notna()]["pk"].nunique()
    total = pdf["pk"].nunique()
    assert 0.6 * total < with_static < 0.8 * total  # ~70% per fixture design


def test_exact_dedup_finds_planted_duplicates(spark, fixtures):
    df = spark.read.parquet(os.path.join(fixtures, "docs_dedup.parquet"))
    total = df.count()
    uniq = exact_dedup(df, text_col="text", id_col="doc_id").count()
    # ≥10% exact duplicates were planted (dups can also collide by chance)
    assert uniq <= total * 0.9 + 50
    assert uniq > total * 0.7


def test_minhash_recall_on_planted_near_dups(spark, fixtures):
    df = spark.read.parquet(os.path.join(fixtures, "docs_dedup.parquet"))
    pairs = minhash_lsh_candidates(
        df, num_hashes=32, bands=8, shingle_n=3
    ).filter(F.col("est_jaccard") >= 0.5)
    found = {(r.a, r.b) for r in pairs.collect()}
    # planted: docs ≥ 80% of corpus are near-copies of origin_id
    planted = {
        (min(r.doc_id, r.origin_id), max(r.doc_id, r.origin_id))
        for r in df.filter(F.col("doc_id") != F.col("origin_id")).collect()
    }
    if not planted:
        pytest.skip("limit cut off planted dups")
    recall = len(found & planted) / len(planted)
    assert recall > 0.5, f"minhash recall too low: {recall:.2f}"
