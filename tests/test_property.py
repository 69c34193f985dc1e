"""Property-based tests (hypothesis) — the reference's QuickTheories
strategy (SURVEY §5.2) carried over: random inputs, invariant assertions.

Spark jobs are slow per-example, so properties are checked by generating
one random *table* per example batch and asserting set-level invariants.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_analytics_spark.functions.tokens import MAX_TOKEN, MIN_TOKEN, _murmur3_64
from cassandra_analytics_spark.fixtures import NOW_MICROS
from cassandra_analytics_spark.operators.merge import compaction_merge

MV_SCHEMA = (
    "pk int, ck int, val int, writetime long, ttl int, tombstone string, "
    "replica_id int"
)

versions = st.lists(
    st.tuples(
        st.integers(0, 5),  # pk
        st.integers(0, 2),  # ck
        st.integers(0, 100),  # val
        st.integers(1, 1000),  # writetime
        st.sampled_from([None, "row", "partition", "cell:val"]),  # tombstone
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(versions)
def test_merge_invariants(spark, rows):
    df = spark.createDataFrame(
        [(pk, ck, None if t else v, wt, None, t, 1) for pk, ck, v, wt, t in rows],
        MV_SCHEMA,
    )
    out = compaction_merge(df, ["pk"], ["ck"], now_micros=NOW_MICROS).collect()

    by_key: dict = {}
    for pk, ck, v, wt, t in rows:
        by_key.setdefault((pk, ck), []).append((v, wt, t))

    seen = {(r.pk, r.ck) for r in out}
    assert len(seen) == len(out)  # (I1) at most one output row per key

    for r in out:
        hist = by_key[(r.pk, r.ck)]
        data_wts = [wt for v, wt, t in hist if t is None]
        assert data_wts, "output row must come from a data version"
        max_wt = max(data_wts)
        # (I2) winner's writetime is the max data writetime
        # (I3) no row survives a >= row/partition tombstone
        row_ts = [wt for _, wt, t in hist if t == "row"]
        part_ts = [
            wt
            for (pk2, ck2), h in by_key.items()
            if pk2 == r.pk
            for _, wt, t in h
            if t == "partition"
        ]
        for twt in row_ts + part_ts:
            assert max_wt > twt
        # (I4) cell tombstone >= winner nulls the value
        cell_ts = [wt for _, wt, t in hist if t == "cell:val"]
        if cell_ts and max(cell_ts) >= max_wt:
            assert r.val is None

    # (I5) keys whose newest version is a deletion never appear
    for (pk, ck), hist in by_key.items():
        data_wts = [wt for _, wt, t in hist if t is None]
        del_wts = [wt for _, wt, t in hist if t in ("row", "partition")]
        part_wts = [
            wt
            for (pk2, _), h in by_key.items()
            if pk2 == pk
            for _, wt, t in h
            if t == "partition"
        ]
        covering = del_wts + part_wts
        if not data_wts or (covering and max(covering) >= max(data_wts)):
            assert (pk, ck) not in seen


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_murmur3_total_and_stable(data):
    t1 = _murmur3_64(data)
    t2 = _murmur3_64(data)
    assert t1 == t2
    assert MIN_TOKEN <= t1 <= MAX_TOKEN


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_murmur3_long_keys_distinct_prefix(v):
    # serialization is injective → equal tokens only for equal keys
    # (sanity: hashing the same long twice is stable, different longs
    # overwhelmingly differ)
    b = v.to_bytes(8, "big", signed=True)
    assert _murmur3_64(b) == _murmur3_64(b)


# -- connected components vs a reference union-find -----------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_lists)
def test_connected_components_match_union_find(spark, edges):
    from cassandra_analytics_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical root = min node of each component
    expected = {}
    for n in parent:
        root = find(n)
        expected[n] = min(m for m in parent if find(m) == root)

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Per-cell LWW (cell_lww=True) vs a direct Python model — the reference's
# randomized upsert suites (EndToEndTests.java:2058-2246) carried over.
# ---------------------------------------------------------------------------

cell_versions = st.lists(
    st.tuples(
        st.integers(0, 3),  # pk
        st.one_of(st.none(), st.integers(0, 50)),  # col a (None = not written)
        st.one_of(st.none(), st.integers(0, 50)),  # col b
        st.integers(1, 500),  # writetime
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(cell_versions)
def test_cell_lww_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(pk, a, b, wt) for pk, a, b, wt in rows],
        "pk int, a int, b int, writetime long",
    )
    out = {
        r.pk: (r.a, r.b)
        for r in compaction_merge(
            df, ["pk"], ttl_col=None, tombstone_col=None, cell_lww=True
        ).collect()
    }

    # Python model: per column independently, keep the value of the cell
    # with max (writetime, value) among versions where it was written.
    model: dict = {}
    for pk, a, b, wt in rows:
        cur = model.setdefault(pk, {"a": None, "b": None})
        for col, v in (("a", a), ("b", b)):
            if v is None:
                continue
            best = cur[col]
            if best is None or (wt, v) > best:
                cur[col] = (wt, v)
    expect = {
        pk: (
            cur["a"][1] if cur["a"] else None,
            cur["b"][1] if cur["b"] else None,
        )
        for pk, cur in model.items()
    }
    assert out == expect


# --- round-8 continuation operators ---------------------------------------

_docs = st.lists(
    st.tuples(
        st.integers(0, 9),  # doc id
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_remove_repeated_segments_model(spark, docs):
    """remove_repeated_segments equals the obvious python model (first
    occurrence per segment, original order) and is IDEMPOTENT: cleaning a
    cleaned corpus removes nothing."""
    from cassandra_analytics_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in docs], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_repeated_segments(df).collect()}
    for i, words in docs:
        seen, kept = set(), []
        for w in words:
            if w not in seen:
                seen.add(w)
                kept.append(w)
        expect = " ".join(kept) if kept else None
        assert out[i].text == expect
        assert out[i].n_segments == len(words)
        assert out[i].n_removed == len(words) - len(kept)
    # idempotence over the cleaned output (non-null texts only)
    cleaned = remove_repeated_segments(df).filter("text IS NOT NULL")
    twice = remove_repeated_segments(cleaned.select("doc_id", "text"))
    assert twice.filter("n_removed != 0").count() == 0


_ranklists = st.lists(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 30)),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ranklists)
def test_rrf_matches_python_model(spark, lists):
    """reciprocal_rank_fusion equals the integer model: per list, each doc
    contributes scale DIV (k + its BEST rank in that list), n_lists counts
    lists containing the doc."""
    from cassandra_analytics_spark.operators.text import reciprocal_rank_fusion

    ranked = {
        f"l{i}": spark.createDataFrame(
            rows or [(None, None)], "doc_id long, rank int"
        )
        for i, rows in enumerate(lists)
    }
    got = {
        r.doc_id: (r.rrf_fp, r.n_lists)
        for r in reciprocal_rank_fusion(ranked, k=60, scale=1_000_000).collect()
    }
    model: dict[int, list[int]] = {}
    for rows in lists:
        best: dict[int, int] = {}
        for d, rk in rows:
            if d is not None and rk is not None and rk >= 1:
                best[d] = min(best.get(d, rk), rk)
        for d, rk in best.items():
            model.setdefault(d, []).append(1_000_000 // (60 + rk))
    assert got == {d: (sum(cs), len(cs)) for d, cs in model.items()}


_vecs = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vecs)
def test_semantic_dedup_survivor_invariants(spark, vecs):
    """semantic_dedup invariants vs a python brute-force model: a doc is
    removed iff SOME lower-id same-cell doc is >= threshold-similar;
    kept_rep is the smallest such id."""
    import math

    from cassandra_analytics_spark.operators.similarity import semantic_dedup

    centroids = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    got = {r.removed: (r.cell, r.kept_rep)
           for r in semantic_dedup(df, centroids, threshold=0.9).collect()}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return None
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    def cell_of(v):
        best = None
        for cid, c in centroids:
            s = cos(v, c)
            s = -2.0 if s is None else s
            # lowest cid wins ties
            if best is None or s > best[0] or (s == best[0] and cid < best[1]):
                best = (s, cid)
        return best[1]

    cells = {i: cell_of(v) for i, v in vecs}
    for i, v in vecs:
        partners = [
            j
            for j, w in vecs
            if j < i and cells[j] == cells[i]
            and (cos(w, v) or -2.0) >= 0.9 - 1e-12
        ]
        if i in got:
            assert partners, f"doc {i} removed with no qualifying partner"
            assert got[i][0] == cells[i]
            # float-boundary pairs can disagree in the last ulp between the
            # python model and Spark; the representative must at least BE a
            # qualifying lower-id same-cell partner
            assert got[i][1] in partners
