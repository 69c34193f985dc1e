"""Deterministic Cassandra-semantics fixtures (FIXTURES.md §B/§C).

Generated once under ``fixtures/`` (parquet + sidecar schema JSON), seeded
numpy RNG — modeled on the reference's test corpus: multi-version rows for
LWW-merge (``EndToEndTests.java testMultipleSSTablesCompaction:242``),
tombstones (``:589,:637,:682``), static columns (``:435``), near-duplicate
documents for the dedup operators.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

SEED = 42
NOW_MICROS = 1_700_000_000_000_000  # fixed "now" so TTL expiry is reproducible


def _write(path: str, name: str, df: pd.DataFrame, schema: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    df.to_parquet(os.path.join(path, f"{name}.parquet"), index=False)
    with open(os.path.join(path, f"{name}.schema.json"), "w") as f:
        json.dump({"table": name, "columns": schema}, f, indent=2)


def gen_basic_kv(path: str, rows: int = 10_000) -> None:
    """B1: minimum slice (README.md:36 basic_test shape)."""
    rng = np.random.default_rng(SEED)
    df = pd.DataFrame(
        {
            "a": np.arange(rows, dtype="int64"),
            "b": rng.integers(0, 1 << 40, rows),
            "c": [f"value-{i:08d}" for i in range(rows)],
        }
    )
    _write(path, "basic_kv", df, [
        {"name": "a", "type": "bigint", "kind": "partition_key", "position": 0},
        {"name": "b", "type": "bigint", "kind": "regular"},
        {"name": "c", "type": "text", "kind": "regular"},
    ])


def gen_compound_keys(path: str, rows: int = 20_000, partitions: int = 800) -> None:
    """B2: key shapes with one skewed partition (EndToEndTests.java:114-204)."""
    rng = np.random.default_rng(SEED)
    hot = rows // 5  # one partition holds 20% of rows
    pk_idx = np.concatenate(
        [np.zeros(hot, dtype="int64"), rng.integers(1, partitions, rows - hot)]
    )
    df = pd.DataFrame(
        {
            "pk1": [f"part-{i:05d}" for i in pk_idx],
            "pk2": (pk_idx % 13).astype("int32"),
            "ck1": pd.to_datetime(
                rng.integers(1_500_000_000, 1_700_000_000, rows), unit="s"
            ),
            "ck2": [f"c{v:04d}" for v in rng.integers(0, 10_000, rows)],
            "val": rng.normal(100.0, 25.0, rows),
        }
    )
    _write(path, "compound_keys", df, [
        {"name": "pk1", "type": "text", "kind": "partition_key", "position": 0},
        {"name": "pk2", "type": "int", "kind": "partition_key", "position": 1},
        {"name": "ck1", "type": "timestamp", "kind": "clustering", "position": 0, "order": "ASC"},
        {"name": "ck2", "type": "text", "kind": "clustering", "position": 1, "order": "DESC"},
        {"name": "val", "type": "double", "kind": "regular"},
    ])


def gen_multiversion(path: str, keys: int = 5_000, versions: int = 3) -> None:
    """B4: RF=3 conflicting versions per key; expected winner = max
    writetime, ties to greater value (CompactionStreamScanner semantics)."""
    rng = np.random.default_rng(SEED)
    recs = []
    for k in range(keys):
        base_wt = int(rng.integers(1, 1_000_000)) * 1000
        for v in range(versions):
            # 10% of keys get a deliberate writetime tie on the last two versions
            wt = base_wt + (v if (k % 10 or v < versions - 1) else v - 1) * 1000
            recs.append(
                {
                    "pk": f"k{k:06d}",
                    "ck": int(k % 7),
                    "val": float(rng.integers(0, 1_000_000)),
                    "writetime": wt,
                    "ttl": None,
                    "tombstone": None,
                    "replica_id": v + 1,
                }
            )
    df = pd.DataFrame(recs)
    df["ttl"] = df["ttl"].astype("object")
    _write(path, "multiversion", df, [
        {"name": "pk", "type": "text", "kind": "partition_key", "position": 0},
        {"name": "ck", "type": "int", "kind": "clustering", "position": 0, "order": "ASC"},
        {"name": "val", "type": "double", "kind": "regular"},
    ])


def gen_tombstones(path: str, rows: int = 10_000) -> None:
    """B5: 10% partition / 10% row / 10% cell tombstones, 10% expired TTL."""
    rng = np.random.default_rng(SEED)
    recs = []
    for i in range(rows):
        pk = f"p{i % 1000:04d}"
        kind = i % 10
        rec = {
            "pk": pk,
            "ck": i // 1000,
            "val": f"v{i}",
            "writetime": 1_000_000 + i,
            "ttl": None,
            "tombstone": None,
            "replica_id": 1,
        }
        if kind == 0 and i >= 9000:  # partition tombstones arrive last → newest
            rec.update(tombstone="partition", val=None, writetime=5_000_000 + i)
        elif kind == 1:
            rec.update(tombstone="row", val=None, writetime=2_000_000 + i)
        elif kind == 2:
            rec.update(tombstone="cell:val", val=None, writetime=2_000_000 + i)
        elif kind == 3:
            rec.update(ttl=1, writetime=100)  # long expired vs NOW_MICROS
        recs.append(rec)
    df = pd.DataFrame(recs)
    _write(path, "tombstones", df, [
        {"name": "pk", "type": "text", "kind": "partition_key", "position": 0},
        {"name": "ck", "type": "int", "kind": "clustering", "position": 0, "order": "ASC"},
        {"name": "val", "type": "text", "kind": "regular"},
    ])


def gen_static_cols(path: str, partitions: int = 2_000) -> None:
    """B6: static column set on one row per partition; 30% of partitions
    never set it; some key-only rows (row-marker analog)."""
    rng = np.random.default_rng(SEED)
    recs = []
    for p in range(partitions):
        n_rows = int(rng.integers(1, 8))
        has_static = p % 10 >= 3
        for r in range(n_rows):
            recs.append(
                {
                    "pk": p,
                    "ck": r,
                    "s": f"static-{p}" if (has_static and r == 0) else None,
                    "val": int(rng.integers(0, 1000)) if r % 3 else None,
                }
            )
    df = pd.DataFrame(recs)
    df["pk"] = df["pk"].astype("int32")
    df["ck"] = df["ck"].astype("int32")
    df["val"] = df["val"].astype("object")
    _write(path, "static_cols", df, [
        {"name": "pk", "type": "int", "kind": "partition_key", "position": 0},
        {"name": "ck", "type": "int", "kind": "clustering", "position": 0, "order": "ASC"},
        {"name": "s", "type": "text", "kind": "static"},
        {"name": "val", "type": "int", "kind": "regular"},
    ])


def gen_docs_dedup(path: str, rows: int = 10_000) -> None:
    """C1: 10% exact duplicates, 10% near-duplicates (small token edits)."""
    rng = np.random.default_rng(SEED)
    vocab = [
        "spark", "table", "scan", "merge", "join", "window", "batch", "stream",
        "filter", "column", "row", "hash", "sort", "data", "key", "value",
        "query", "group", "order", "part", "vector", "small", "fast", "slow",
    ]
    base_docs = []
    for i in range(int(rows * 0.8)):
        n = int(rng.integers(30, 80))
        base_docs.append(" ".join(rng.choice(vocab, n)))
    texts: list[str] = list(base_docs)
    origin: list[int] = list(range(len(base_docs)))
    n_exact = int(rows * 0.1)
    for i in range(n_exact):  # exact dups
        j = int(rng.integers(0, len(base_docs)))
        texts.append(base_docs[j])
        origin.append(j)
    while len(texts) < rows:  # near dups: edit ~3% of tokens
        j = int(rng.integers(0, len(base_docs)))
        toks = base_docs[j].split()
        n_edits = max(1, len(toks) // 33)
        for _ in range(n_edits):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        texts.append(" ".join(toks))
        origin.append(j)
    emb = rng.normal(0, 1, (rows, 64)).astype("float32")
    # near/exact dup docs get embeddings near their origin's
    for i in range(int(rows * 0.8), rows):
        emb[i] = emb[origin[i]] + rng.normal(0, 0.01, 64).astype("float32")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(rows, dtype="int64"),
            "text": texts,
            "origin_id": np.array(origin, dtype="int64"),
            "embedding": [e for e in emb],
        }
    )
    _write(path, "docs_dedup", df, [
        {"name": "doc_id", "type": "bigint", "kind": "partition_key", "position": 0},
        {"name": "text", "type": "text", "kind": "regular"},
        {"name": "origin_id", "type": "bigint", "kind": "regular"},
        {"name": "embedding", "type": "frozen<list<float>>", "kind": "regular"},
    ])


def generate_all(path: str) -> None:
    gen_basic_kv(path)
    gen_compound_keys(path)
    gen_multiversion(path)
    gen_tombstones(path)
    gen_static_cols(path)
    gen_docs_dedup(path)


def ensure_fixtures(path: str) -> str:
    """Generate once; reuse forever (FIXTURES.md: never regenerate in tests)."""
    marker = os.path.join(path, "_GENERATED")
    if not os.path.exists(marker):
        generate_all(path)
        with open(marker, "w") as f:
            f.write("seed=42\n")
    return path
