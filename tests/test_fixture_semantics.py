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


def test_ngram_jaccard_stop_shingle_cap(spark):
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

    # 2000 docs all sharing one boilerplate stop-shingle ("common header
    # line"), plus one genuine near-dup pair. Uncapped, the stop-shingle
    # alone would emit ~2M join rows; with the cap the hot shingle is
    # dropped and only the real pair survives.
    rows = [
        (i, f"common header line unique{i} tail{i} word{i} extra{i}")
        for i in range(2000)
    ]
    rows.append((9001, "the quick brown fox jumps over the lazy dog today"))
    rows.append((9002, "the quick brown fox jumps over the lazy dog now"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(
        df, shingle_n=3, threshold=0.5, max_shingle_df=50
    ).collect()
    assert {(r.a, r.b) for r in pairs} == {(9001, 9002)}


def test_ngram_jaccard_cap_none_keeps_boilerplate_pairs(spark):
    from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

    # sanity: without the cap the boilerplate shingle does create pairs
    rows = [
        (1, "shared boilerplate text alpha beta"),
        (2, "shared boilerplate text gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.1).collect()
    assert len(uncapped) == 1
    capped = ngram_jaccard_pairs(
        df, shingle_n=3, threshold=0.1, max_shingle_df=1
    ).collect()
    assert capped == []


def test_simhash_long_document_no_lane_overflow(spark):
    from cassandra_analytics_spark.operators.dedup import simhash_sketches

    # ~70k shingles: past the old 16-bit lane capacity (65535), where the
    # packed counters silently overflowed into the adjacent bit.
    long_text = " ".join(f"w{i}" for i in range(70_001))
    df = spark.createDataFrame(
        [(1, long_text), (2, long_text), (3, "totally different short doc")],
        "doc_id long, text string",
    )
    sk = {r.id: r.sk for r in simhash_sketches(df).collect()}
    assert sk[1] == sk[2]  # identical docs → identical sketch
    assert sk[1] >= 0
    # a 70k-shingle doc has every lane near 70k votes; the sketch must
    # still be a valid 63-bit value, not lane-bleed garbage
    assert sk[1] < 2**63
    assert sk[1] != sk[3]


def test_simhash_rejects_radius_beyond_block_guarantee(spark):
    """max_hamming >= num_blocks breaks the pigeonhole guarantee — a
    qualifying pair can differ in every block and never collide. Reject
    instead of returning silently-incomplete results."""
    import pytest

    from cassandra_analytics_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame([(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="num_blocks"):
        simhash_near_dup_pairs(df, max_hamming=6, num_blocks=4)


def test_simhash_multiblock_keys_match_single_block_recall(spark):
    """8 blocks taken 2 at a time must find exactly the pairs 7 single
    blocks find when no bucket cap bites (same radius-6 guarantee), and
    the guard tracks num_blocks - blocks_per_key."""
    import pytest

    from cassandra_analytics_spark.operators.dedup import simhash_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [(i, base + f"suffix {i % 4}") for i in range(40)], ["doc_id", "text"]
    )
    a = {(r.a, r.b, r.hamming) for r in
         simhash_near_dup_pairs(docs, max_hamming=6, num_blocks=7).collect()}
    b = {(r.a, r.b, r.hamming) for r in
         simhash_near_dup_pairs(
             docs, max_hamming=6, num_blocks=8, blocks_per_key=2
         ).collect()}
    assert a == b and a
    with pytest.raises(ValueError, match="blocks_per_key"):
        simhash_near_dup_pairs(docs, max_hamming=7, num_blocks=8, blocks_per_key=2)


def test_nanos_to_micros_floor_for_pre_epoch(spark, tmp_path):
    """Round-8 hostile pass: `ts div 1000` truncates toward zero, so a
    pre-epoch nano timestamp (-1500 ns) would map to -1 µs instead of
    flooring to -2 µs (DuckDB's TIMESTAMP_NS→US cast floors)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_analytics_spark.catalog import load_table

    path = str(tmp_path / "events.parquet")
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([-1500, 1500, -2000], pa.timestamp("ns")),
    })
    pq.write_table(tbl, path)
    got = {r.event_id: r.ts for r in
           load_table(spark, str(tmp_path), "events").collect()}
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    assert got[1] == epoch - dt.timedelta(microseconds=2)  # floor(-1.5)
    assert got[2] == epoch + dt.timedelta(microseconds=1)  # floor(+1.5)
    assert got[3] == epoch - dt.timedelta(microseconds=2)  # exact
