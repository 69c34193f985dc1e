"""Persistent ANN index: sign-LSH signatures as a partition column.

The scale path for similarity search at 100 TB: precompute each vector's
LSH bucket once and lay the corpus out partitioned by bucket
(``partitionBy(sig)``), so a query reads only the files of its own (and
optionally neighboring) buckets — partition pruning instead of a corpus
scan. The same layout idea the reference applies with token ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.similarity import (
    cosine,
    dot,
    lit_vector,
    random_hyperplanes,
)


def _signature_column(vec_col: str, dim: int, num_planes: int, seed: int):
    planes = random_hyperplanes(dim, num_planes, seed)
    bits = [
        F.when(
            dot(F.col(vec_col), lit_vector(plane)) >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def _signature_of(vec: list[float], num_planes: int, seed: int) -> int:
    planes = random_hyperplanes(len(vec), num_planes, seed)
    sig = 0
    for i, plane in enumerate(planes):
        if sum(float(q) * p for q, p in zip(vec, plane)) >= 0:
            sig |= 1 << i
    return sig


def build_ann_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    seed: int = 42,
) -> None:
    """Materialize the corpus partitioned by LSH signature."""
    dim = len(df.select(vec_col).first()[vec_col])
    tagged = df.select(
        F.col(id_col),
        F.col(vec_col),
        _signature_column(vec_col, dim, num_planes, seed).alias("sig"),
    )
    tagged.write.mode("overwrite").partitionBy("sig").parquet(index_path)


def query_ann_index(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Top-k within the query's bucket (+ buckets within ``probe_hamming``
    bit flips — multiprobe). The ``sig`` filter is a partition-column
    predicate, so only those directories are read."""
    qsig = _signature_of(query_vec, num_planes, seed)
    probes = {qsig}
    if probe_hamming >= 1:
        for i in range(num_planes):
            probes.add(qsig ^ (1 << i))
    index = spark.read.parquet(index_path)
    candidates = index.filter(F.col("sig").isin(sorted(probes)))
    q = lit_vector(query_vec)
    return (
        candidates.select(
            F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
