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
