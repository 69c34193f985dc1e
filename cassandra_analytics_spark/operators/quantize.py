"""Int8 scalar quantization for embedding columns.

The storage-scale lever for 100 TB embedding corpora: a float32 vector
column is 4 bytes/dim; affine per-vector int8 quantization stores 1
byte/dim plus two doubles of metadata — a ~4x scan/shuffle reduction
for every downstream pass that tolerates quantization noise (ANN
candidate generation, near-dup prefilters), with the float column kept
only for final re-scoring. The standard per-vector affine scheme
(``code = round((x - min) / scale) - 128``, ``scale = (max - min)/255``)
is used by FAISS's SQ8 and most vector stores.

Everything is a pure codegen expression — no UDFs, no shuffles: the
quantization is a per-row ``transform`` over the array, so it rides any
existing scan. Reconstruction error is bounded by ``scale/2`` per
element (round-to-nearest over a 255-step grid), pinned by test.

Numeric contract: elements are cast to DOUBLE before any arithmetic so
the math matches the DuckDB oracle bit-for-bit (FLOAT-typed inputs
would otherwise mix float32 subtraction into the pipeline). Non-finite
elements (NaN/Inf) are REFUSED loudly — min/max over them poisons the
scale silently for the whole vector. NULL vectors pass through as NULL
(consistent with the similarity layer); NULL ELEMENTS inside a vector
are refused for the same reason as non-finites.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "qvec",
    keep_vec: bool = False,
) -> DataFrame:
    """Affine int8 codes per vector: ``(id_col, code_col array<tinyint>,
    <vec>_min double, <vec>_scale double)``.

    ``scale`` is ``(max - min)/255``; constant vectors (max == min) pin
    ``scale = 1`` so every code is −128 and dequantization returns the
    constant exactly. ``keep_vec=True`` carries the original float
    column through (for re-scoring pipelines)."""
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bad = F.exists(
        dv,
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    guard = F.when(
        F.col(vec_col).isNull() | ~bad, F.lit(True)
    ).otherwise(
        F.raise_error(
            F.lit(
                "quantize_embeddings: vector contains NULL/NaN/Inf "
                "elements — min/max over them silently poisons the scale; "
                "clean the column first"
            )
        ).cast("boolean")
    )
    vmin = F.array_min(dv)
    vmax = F.array_max(dv)
    raw_scale = (vmax - vmin) / F.lit(255.0)
    scale = F.when(raw_scale == 0.0, F.lit(1.0)).otherwise(raw_scale)
    codes = F.transform(
        dv, lambda x: (F.round((x - vmin) / scale) - 128).cast("tinyint")
    )
    cols = [F.col(id_col)]
    if keep_vec:
        cols.append(F.col(vec_col))
    cols.extend(
        [
            F.when(guard, codes).alias(code_col),
            vmin.alias(f"{vec_col}_min"),
            scale.alias(f"{vec_col}_scale"),
        ]
    )
    return df.select(*cols)


def quantized_topk(
    qdf: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "qvec",
    min_col: str = "embedding_min",
    scale_col: str = "embedding_scale",
    vec_col: str | None = None,
    rescore_factor: int = 8,
    dot_fn=None,
    norm_fn=None,
) -> DataFrame:
    """Two-phase cosine top-k over a QUANTIZED corpus: phase 1 ranks by
    the reconstructed-vector cosine computed FROM THE CODES (the scan
    reads 1 byte/dim + two doubles instead of 8 bytes/dim — the ~4-8x
    I/O cut is the whole point at 100 TB), keeps the top
    ``k * rescore_factor``, and — when ``vec_col`` names a float column
    carried by ``quantize_embeddings(keep_vec=True)`` — phase 2 rescores
    those survivors with exact float cosine and returns the top k.

    The reconstructed norm needs NO second pass over the floats: with
    ``u = code + 128``, ``x̂ = u·s + m``, so ``‖x̂‖² = s²·Σu² + 2sm·Σu +
    d·m²`` — three integer reductions over the codes. Phase 1 is a
    TakeOrderedAndProject (per-partition heaps, k·factor rows to the
    driver-side merge); phase 2 touches only the survivors.

    APPROXIMATION CONTRACT: per-element reconstruction error is ≤
    scale/2, so phase-1 ranks can differ from exact ranks only where
    cosine gaps are smaller than the quantization noise; the rescore
    window absorbs swaps within ``k·rescore_factor``. Exactness is
    therefore EMPIRICAL, not guaranteed — the driver-gated query pins it
    hash-exact against the brute-force oracle at the gate SFs, and a
    corpus with adversarially tight cosine gaps needs a larger factor
    (or the float path). Without ``vec_col`` the approximate scores are
    returned as ``cosine_sim`` directly (top k, no rescore).

    NULL/unscorable rows (NULL codes, zero reconstructed norm) never
    rank, matching ``brute_force_topk``. ``dot_fn``/``norm_fn`` swap in
    custom math for the RESCORE phase only (e.g. the portable decimal
    cosine for oracle-exact runs — the repo's standard read-math hook);
    phase 1 always uses the closed-form code arithmetic above.
    """
    from cassandra_analytics_spark.operators.similarity import (
        cosine,
        lit_vector,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rescore_factor < 1:
        raise ValueError(
            f"rescore_factor must be >= 1, got {rescore_factor}"
        )
    qv = [float(x) for x in query_vec]
    if not qv or not all(math.isfinite(x) for x in qv):
        # a NaN/Inf query scores every row to NULL → silent empty result
        raise ValueError(
            "quantized_topk: query vector must be non-empty and finite"
        )
    qnorm = math.sqrt(sum(x * x for x in qv))
    qsum = sum(qv)
    qlit = lit_vector(qv)

    # zip_with NULL-pads the shorter side, so a dimension mismatch would
    # silently score to NULL and return an EMPTY result — raise with the
    # offending length instead (the query_ivf_index convention)
    dim_ok = F.size(F.col(code_col)) == F.lit(len(qv))
    guarded_codes = F.when(
        F.col(code_col).isNull() | dim_ok, F.col(code_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"quantized_topk: query vector is {len(qv)}-d but "
                    "found a code vector of length "
                ),
                F.size(F.col(code_col)).cast("string"),
            )
        ).cast(qdf.schema[code_col].dataType)
    )
    u = F.transform(guarded_codes, lambda c: c.cast("double") + F.lit(128.0))
    dot_uq = F.aggregate(
        F.zip_with(u, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sum_u = F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x)
    sum_uu = F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x * x)
    d = F.size(F.col(code_col)).cast("double")
    s, m = F.col(scale_col), F.col(min_col)
    dot_approx = s * dot_uq + m * F.lit(qsum)
    norm_sq = s * s * sum_uu + F.lit(2.0) * s * m * sum_u + d * m * m
    approx = F.try_divide(dot_approx, F.sqrt(norm_sq) * F.lit(qnorm))

    # phase 1 projects ONLY (id, approx): carrying the float column
    # through the TakeOrderedAndProject would make the scan read floats
    # for EVERY row, silently defeating the 1-byte/dim claim (round-10
    # plan audit — .explain showed embedding carried through phase 1)
    scored = (
        qdf.select(F.col(id_col), approx.alias("__approx"))
        .filter(F.col("__approx").isNotNull())
    )
    if vec_col is None:
        return (
            scored.select(F.col(id_col), F.col("__approx").alias("cosine_sim"))
            .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
            .limit(k)
        )
    # bounded collect (k * rescore_factor ids — the centroid-table
    # convention): the survivor list comes back as an isin() predicate,
    # so the float-column rescan is PRUNED at the source (PushedFilters)
    # instead of a second full scan
    survivor_ids = [
        r[id_col]
        for r in scored.orderBy(F.col("__approx").desc(), F.col(id_col))
        .limit(k * rescore_factor)
        .collect()
    ]
    if not survivor_ids:
        from pyspark.sql.types import DoubleType, StructField, StructType

        return qdf.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField(id_col, qdf.schema[id_col].dataType),
                    StructField("cosine_sim", DoubleType()),
                ]
            ),
        )
    if dot_fn is not None or norm_fn is not None:
        from cassandra_analytics_spark.operators.similarity import (
            dot as _dot,
            norm as _norm,
        )

        dotf = dot_fn or _dot
        normf = norm_fn or _norm
        exact = F.try_divide(
            dotf(F.col(vec_col), qlit), normf(F.col(vec_col)) * normf(qlit)
        )
    else:
        exact = cosine(F.col(vec_col), qlit)
    return (
        qdf.filter(F.col(id_col).isin(survivor_ids))
        .select(F.col(id_col), exact.alias("cosine_sim"))
        .filter(F.col("cosine_sim").isNotNull())
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def dequantize_embeddings(
    df: DataFrame,
    code_col: str = "qvec",
    min_col: str = "embedding_min",
    scale_col: str = "embedding_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct ``out_col array<double>`` from int8 codes:
    ``x̂ = (code + 128) * scale + min``; per-element error ≤ scale/2."""
    rec = F.transform(
        F.col(code_col),
        lambda q: (q.cast("double") + F.lit(128.0)) * F.col(scale_col)
        + F.col(min_col),
    )
    return df.withColumn(out_col, rec)
