"""Product quantization (PQ) for embedding columns — the storage lever
PAST int8 scalar quantization.

SQ8 (:mod:`.quantize`) stores 1 byte/dim (8x smaller than float64, 4x
than float32). PQ stores ``m`` bytes per vector REGARDLESS of dimension
(Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the FAISS ``PQm`` scheme): the vector is split
into ``m`` subvectors, each encoded as the id of its nearest centroid
in a per-subspace codebook of ``ks`` (≤256) TRAINED centroids, and a
query scores a code in ``m`` table lookups (ADC — asymmetric distance
computation) without ever reconstructing the vector. At d=64 / m=8
that is a 64x cut vs float64 (8x past SQ8) in scan bytes for the
candidate-ranking phase.

The codebook must be TRAINED (per-subspace k-means over a sample):
round 9 measured sampled (untrained) codebooks weak for IVF routing,
and PQ is strictly more codebook-sensitive — the recall oracle
(``scripts/measure_pq_recall_clustered.py``) gates this the same way
the planted-cluster sweep gated IVF. Training is driver-side numpy
over a BOUNDED sample (the FAISS posture: train on a sample, encode
distributed); encoding is one Arrow-batched numpy matmul per subspace
(the sanctioned vectorized-UDF path — an expression argmin over ks
centroids x m subspaces would embed m·ks struct entries in the plan,
the same analyzer wall the IVF assignment hit at k≈128).

Scoring math: with disjoint subspaces, ``x̂ = concat_i c_i[code_i]``,
so ``x̂·q = Σ_i (c_i[code_i]·q_i)`` — exactly the per-subspace LUT sum —
and ``‖x̂‖² = Σ_i ‖c_i[code_i]‖²``, which is computed ONCE at encode
time and stored (``pq_norm``), so phase 1 reads m bytes + one double
per row. Approximation is EMPIRICAL (no per-element bound like SQ8's
scale/2): the two-phase contract is :func:`~cassandra_analytics_spark.
operators.quantize.quantized_topk`'s — the rescore window absorbs
phase-1 rank swaps, pinned hash-exact at the driver gate SFs, recall
measured on planted clusters at scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PQCodebook:
    """A trained product-quantization codebook: ``centroids[i][j]`` is
    the j-th centroid (length ``dim // m``) of subspace i. ``ks`` ≤ 256
    so codes fit a tinyint (stored as code − 128, the SQ8 convention)."""

    dim: int
    m: int
    ks: int
    centroids: tuple  # m x ks x (dim//m) nested tuples (hashable, serializable)

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def train_pq_codebook(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 256,
    sample_size: int = 20_000,
    iterations: int = 20,
    seed: int = 42,
) -> PQCodebook:
    """Per-subspace k-means over a bounded sample — driver-side numpy
    (the FAISS train-on-sample posture; the sample collect is bounded
    like the IVF centroid table). Deterministic under ``seed``. Empty
    clusters are re-seeded from the farthest points so every codeword
    is live. Vectors shorter/longer than the first row's length, NULLs
    excluded; ``dim % m != 0`` and ``ks > 256`` are refused."""
    import numpy as np

    if m < 1:
        raise ValueError(f"train_pq_codebook: m must be >= 1, got {m}")
    if not 1 <= ks <= 256:
        raise ValueError(
            f"train_pq_codebook: ks must be in [1, 256] (codes are one "
            f"byte), got {ks}"
        )
    rows = (
        df.select(F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("train_pq_codebook: no non-NULL vectors to train on")
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    n, dim = x.shape
    if dim % m != 0:
        raise ValueError(
            f"train_pq_codebook: dim {dim} is not divisible by m={m}"
        )
    k = min(ks, n)  # fewer sample points than codewords: shrink, stay live
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for i in range(m):
        sub = x[:, i * dsub:(i + 1) * dsub]
        cents = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(max(1, iterations)):
            # assign: B x k squared distances via the expansion trick
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cents.T
                + (cents * cents).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cents[j] = sub[mask].mean(axis=0)
                else:
                    # dead codeword: re-seed from the farthest point
                    cents[j] = sub[d2.min(axis=1).argmax()]
        books.append(tuple(tuple(float(v) for v in c) for c in cents))
    return PQCodebook(dim=dim, m=m, ks=k, centroids=tuple(books))


def pq_encode(
    df: DataFrame,
    codebook: PQCodebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pqcode",
    norm_col: str = "pq_norm",
    keep_vec: bool = False,
) -> DataFrame:
    """Encode every vector as ``m`` tinyint codes (code − 128) plus the
    reconstructed norm ``‖x̂‖`` (one double, computed here once so
    phase-1 scoring never touches floats). One Arrow-batched numpy
    argmin per subspace (B x ks matmul, BLAS). NULL vectors produce
    NULL codes/norm; a vector whose length differs from the codebook's
    dim raises loudly inside the batch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cb = [np.asarray(b, dtype=np.float64) for b in codebook.centroids]
    dim, m, dsub = codebook.dim, codebook.m, codebook.dsub

    @pandas_udf("struct<codes: array<tinyint>, nrm: double>")
    def _enc(vecs):
        import pandas as pd

        out_codes, out_nrm = [], []
        mask = vecs.notna()
        if mask.any():
            mat = np.asarray(
                [list(v) for v in vecs[mask]], dtype=np.float64
            )
            if mat.ndim != 2 or mat.shape[1] != dim:
                raise ValueError(
                    f"pq_encode: codebook is {dim}-d but found vectors "
                    f"of shape {mat.shape} — dimension mismatch"
                )
            codes = np.empty((mat.shape[0], m), dtype=np.int16)
            nrm2 = np.zeros(mat.shape[0], dtype=np.float64)
            for i in range(m):
                sub = mat[:, i * dsub:(i + 1) * dsub]
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * sub @ cb[i].T
                    + (cb[i] * cb[i]).sum(axis=1)
                )
                a = d2.argmin(axis=1)
                codes[:, i] = a - 128
                nrm2 += (cb[i][a] * cb[i][a]).sum(axis=1)
            nrm = np.sqrt(nrm2)
        it = iter(range(int(mask.sum())))
        enc_codes = (
            [[int(c) for c in codes[j]] for j in range(codes.shape[0])]
            if mask.any()
            else []
        )
        for ok in mask:
            if ok:
                j = next(it)
                out_codes.append(enc_codes[j])
                out_nrm.append(float(nrm[j]))
            else:
                out_codes.append(None)
                out_nrm.append(None)
        return pd.DataFrame({"codes": out_codes, "nrm": out_nrm})

    enc = _enc(F.col(vec_col))
    cols = [F.col(id_col)]
    if keep_vec:
        cols.append(F.col(vec_col))
    cols.extend(
        [
            enc.getField("codes").alias(code_col),
            enc.getField("nrm").alias(norm_col),
        ]
    )
    return df.select(*cols)


def pq_adc_topk(
    qdf: DataFrame,
    codebook: PQCodebook,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pqcode",
    norm_col: str = "pq_norm",
    vec_col: str | None = None,
    rescore_factor: int = 8,
    dot_fn=None,
    norm_fn=None,
    rescore_mode: str = "pushdown",
) -> DataFrame:
    """Two-phase cosine top-k over a PQ-encoded corpus: phase 1 ranks by
    ADC — the query's per-subspace dot products against every codeword
    are precomputed driver-side into one m·ks literal table, and each
    row's score is m indexed lookups summed (``transform`` with index +
    ``element_at`` — pure codegen, the scan reads m bytes + one double
    per row); phase 2 rescores the top ``k * rescore_factor`` survivors
    with exact float cosine (same machinery and ``rescore_mode``
    contract as ``quantized_topk`` — the two share phase 2).

    APPROXIMATION CONTRACT: PQ reconstruction error has no closed
    per-element bound (it is the subspace k-means residual), so
    phase-1 exactness is EMPIRICAL like SQ8's but coarser at equal m —
    the driver gate pins hash-exactness at the gate SFs and the
    planted-cluster recall sweep measures it at scale
    (PERF.md). NULL/unscorable rows never rank; a code vector whose
    length differs from m raises loudly."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rescore_factor < 1:
        raise ValueError(f"rescore_factor must be >= 1, got {rescore_factor}")
    if rescore_mode not in ("pushdown", "join"):
        raise ValueError(
            f"rescore_mode must be 'pushdown' or 'join', got {rescore_mode!r}"
        )
    qv = [float(x) for x in query_vec]
    if not qv or not all(math.isfinite(x) for x in qv):
        raise ValueError(
            "pq_adc_topk: query vector must be non-empty and finite"
        )
    if len(qv) != codebook.dim:
        raise ValueError(
            f"pq_adc_topk: codebook is {codebook.dim}-d but the query "
            f"vector is {len(qv)}-d"
        )
    qnorm = math.sqrt(sum(x * x for x in qv))
    m, ks, dsub = codebook.m, codebook.ks, codebook.dsub
    # the ADC lookup table: lut[i*ks + j] = q_i · centroids[i][j]
    lut = [
        sum(
            qv[i * dsub + t] * codebook.centroids[i][j][t]
            for t in range(dsub)
        )
        for i in range(m)
        for j in range(ks)
    ]
    lut_lit = F.lit(lut)
    dim_ok = F.size(F.col(code_col)) == F.lit(m)
    guarded = F.when(
        F.col(code_col).isNull() | dim_ok, F.col(code_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"pq_adc_topk: codebook has m={m} subspaces but found "
                    "a code vector of length "
                ),
                F.size(F.col(code_col)).cast("string"),
            )
        ).cast("array<tinyint>")
    )
    # element_at is 1-based; stored code = argmin − 128
    contrib = F.transform(
        guarded,
        lambda c, i: F.element_at(
            lut_lit, i * F.lit(ks) + c.cast("int") + F.lit(129)
        ),
    )
    adc = F.aggregate(contrib, F.lit(0.0), lambda acc, x: acc + x)
    approx = F.try_divide(adc, F.col(norm_col) * F.lit(qnorm))
    scored = (
        qdf.select(F.col(id_col), approx.alias("__approx"))
        .filter(F.col("__approx").isNotNull())
    )
    from cassandra_analytics_spark.operators.quantize import (
        _phase2_exact_topk,
    )

    return _phase2_exact_topk(
        qdf, scored, qv, k, id_col, vec_col, rescore_factor,
        rescore_mode, dot_fn, norm_fn,
    )


_PQ_SPEC_SCHEMA = "format string, dim int, m int, ks int, keep_vec boolean"


def save_pq_index(
    df: DataFrame,
    index_path: str,
    codebook: PQCodebook | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = True,
    m: int = 16,
    ks: int = 256,
    sample_size: int = 20_000,
    iterations: int = 15,
    seed: int = 42,
) -> PQCodebook:
    """Materialize a PQ-encoded corpus as a PERSISTED layout — the PQ
    twin of the LSH/IVF layouts' spec discipline: the encoded table at
    ``index_path``, the codebook at ``{index_path}_codebook`` (one row
    per (subspace, code) centroid — metadata-sized), and a spec at
    ``{index_path}_spec`` pinning (dim, m, ks, keep_vec) so reads
    refuse a layout whose geometry they cannot honor. ``codebook=None``
    trains one here (:func:`train_pq_codebook`); passing one reuses an
    external fit. ``keep_vec=False`` drops the float column — 
    approximate-only reads at m bytes + one double per row (the
    archival-tier shape); ``query_pq_index`` then refuses rescore
    requests LOUDLY instead of silently returning approximate scores.

    The spec is deleted before the layout overwrite (crash mid-rebuild
    leaves a detectably spec-less layout, the LSH/IVF convention)."""
    spark = df.sparkSession
    if codebook is None:
        codebook = train_pq_codebook(
            df, vec_col=vec_col, m=m, ks=ks, sample_size=sample_size,
            iterations=iterations, seed=seed,
        )
    from cassandra_analytics_spark.fs import delete_path

    delete_path(spark, f"{index_path}_spec")
    pq_encode(
        df, codebook, id_col=id_col, vec_col=vec_col, keep_vec=keep_vec
    ).write.mode("overwrite").parquet(index_path)
    cb_rows = [
        (i, j, list(codebook.centroids[i][j]))
        for i in range(codebook.m)
        for j in range(codebook.ks)
    ]
    spark.createDataFrame(
        cb_rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}_codebook")
    spark.createDataFrame(
        [("pq-v1", codebook.dim, codebook.m, codebook.ks, keep_vec)],
        _PQ_SPEC_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}_spec")
    return codebook


def read_pq_spec(spark, index_path: str) -> dict:
    """The persisted spec of a PQ layout; loud on missing/corrupt."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(f"{index_path}_spec").collect()
    except AnalysisException:
        raise ValueError(
            f"{index_path!r} has no persisted PQ spec "
            f"({index_path}_spec) — not a save_pq_index layout (or a "
            "rebuild crashed mid-write; rebuild with save_pq_index)"
        ) from None
    if len(rows) != 1 or rows[0]["format"] != "pq-v1":
        raise ValueError(
            f"corrupt PQ spec at {index_path}_spec: expected one "
            f"'pq-v1' row, found {rows!r}"
        )
    return rows[0].asDict()


def load_pq_codebook(spark, index_path: str) -> PQCodebook:
    """Rehydrate the trained codebook of a persisted layout (bounded
    collect — m x ks rows of metadata, the centroid-table convention)."""
    spec = read_pq_spec(spark, index_path)
    rows = spark.read.parquet(f"{index_path}_codebook").collect()
    want = spec["m"] * spec["ks"]
    if len(rows) != want:
        raise ValueError(
            f"corrupt PQ codebook at {index_path}_codebook: spec says "
            f"m={spec['m']} x ks={spec['ks']} = {want} centroids, found "
            f"{len(rows)}"
        )
    books: dict[int, dict[int, tuple]] = {}
    for r in rows:
        books.setdefault(r["sub"], {})[r["code"]] = tuple(
            float(v) for v in r["centroid"]
        )
    cents = tuple(
        tuple(books[i][j] for j in range(spec["ks"]))
        for i in range(spec["m"])
    )
    return PQCodebook(
        dim=spec["dim"], m=spec["m"], ks=spec["ks"], centroids=cents
    )


def query_pq_index(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore: bool = True,
    rescore_factor: int = 8,
    dot_fn=None,
    norm_fn=None,
    rescore_mode: str = "pushdown",
    codebook: PQCodebook | None = None,
) -> DataFrame:
    """Top-k over a persisted PQ layout: rehydrate the pinned codebook,
    ADC-rank from the m-byte codes, exact-rescore from the layout's
    float column. ``rescore=True`` against a ``keep_vec=False`` layout
    is REFUSED loudly (the floats are not there — silently returning
    approximate scores would quietly weaken the caller's ask, the
    round-10 CL-selection lesson); pass ``rescore=False`` for the
    approximate-only read that layout is for.

    ``codebook=`` preloads the codebook ONCE for a query batch (the
    100x soak measured the per-call m·ks rehydration collect as real
    per-query overhead); it must MATCH the layout's spec geometry —
    a mismatched preload is refused, not silently mis-decoded."""
    spec = read_pq_spec(spark, index_path)
    if codebook is None:
        codebook = load_pq_codebook(spark, index_path)
    elif (codebook.dim, codebook.m, codebook.ks) != (
        spec["dim"], spec["m"], spec["ks"]
    ):
        raise ValueError(
            f"query_pq_index: preloaded codebook geometry "
            f"(dim={codebook.dim}, m={codebook.m}, ks={codebook.ks}) does "
            f"not match the layout spec (dim={spec['dim']}, m={spec['m']}, "
            f"ks={spec['ks']}) at {index_path!r}"
        )
    if rescore and not spec["keep_vec"]:
        raise ValueError(
            f"{index_path!r} was saved with keep_vec=False (codes-only "
            "archival layout) — exact rescoring needs the float column; "
            "pass rescore=False for approximate scores, or rebuild with "
            "keep_vec=True"
        )
    qdf = spark.read.parquet(index_path)
    return pq_adc_topk(
        qdf, codebook, query_vec, k=k, id_col=id_col,
        vec_col=vec_col if rescore else None,
        rescore_factor=rescore_factor, dot_fn=dot_fn, norm_fn=norm_fn,
        rescore_mode=rescore_mode,
    )


_IVF_PQ_SPEC_SCHEMA = (
    "format string, dim int, m int, ks int, num_centroids int, "
    "keep_vec boolean"
)


def save_ivf_pq_index(
    df: DataFrame,
    index_path: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    num_centroids: int = 16,
    codebook: PQCodebook | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = True,
    m: int = 16,
    ks: int = 256,
    sample_size: int = 20_000,
    iterations: int = 15,
    seed: int = 42,
) -> tuple[list[tuple[int, list[float]]], PQCodebook]:
    """The FAISS IVF-PQ composition as a persisted layout: the corpus
    is cell-partitioned by nearest coarse centroid (the IVF side — a
    probe reads only its cells' directories, partition pruning) AND
    PQ-encoded inside every cell (the PQ side — the pruned scan reads
    m bytes + one double per row). Self-contained over the same layout
    discipline as :func:`save_pq_index`: spec (``ivf-pq-v1``) + coarse
    centroid table + codebook persist beside the data, spec deleted
    first so a torn rebuild is detectable.

    ``centroids=None`` samples ``num_centroids`` coarse centroids
    (:func:`~cassandra_analytics_spark.operators.similarity.
    sample_centroids` — the codebook-fit stand-in; pass a k-means fit
    for production routing, the r9 recall lesson); ``codebook=None``
    trains the PQ codebooks here. Cell assignment is the shared
    linear-size argmax expression — fine to k≈128; beyond that pass
    precomputed assignments through the plain IVF layout instead
    (`build_ivf_index(assignment="vectorized")`), whose SQ8 codes are
    the measured-at-scale alternative."""
    from cassandra_analytics_spark.fs import delete_path
    from cassandra_analytics_spark.operators.similarity import (
        nearest_centroid_cell,
        sample_centroids,
    )

    spark = df.sparkSession
    if centroids is None:
        centroids = sample_centroids(
            df, num_centroids, id_col=id_col, vec_col=vec_col, seed=seed
        )
    if not centroids:
        raise ValueError(
            "save_ivf_pq_index: no coarse centroids (empty corpus?) — "
            "an IVF layout needs at least one cell"
        )
    centroids = sorted((int(c), [float(x) for x in v]) for c, v in centroids)
    if codebook is None:
        codebook = train_pq_codebook(
            df, vec_col=vec_col, m=m, ks=ks, sample_size=sample_size,
            iterations=iterations, seed=seed,
        )
    delete_path(spark, f"{index_path}_spec")
    encoded = pq_encode(
        df, codebook, id_col=id_col, vec_col=vec_col, keep_vec=True
    )
    # cell from the FLOAT vector (same routing math as reads), then the
    # float column dropped if the caller asked for a codes-only layout
    tagged = encoded.withColumn(
        "cell", nearest_centroid_cell(F.col(vec_col), centroids)
    )
    if not keep_vec:
        tagged = tagged.drop(vec_col)
    tagged.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    spark.createDataFrame(
        centroids, "cid int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}_centroids")
    cb_rows = [
        (i, j, list(codebook.centroids[i][j]))
        for i in range(codebook.m)
        for j in range(codebook.ks)
    ]
    spark.createDataFrame(
        cb_rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}_codebook")
    spark.createDataFrame(
        [("ivf-pq-v1", codebook.dim, codebook.m, codebook.ks,
          len(centroids), keep_vec)],
        _IVF_PQ_SPEC_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}_spec")
    return centroids, codebook


def read_ivf_pq_spec(spark, index_path: str) -> dict:
    """The persisted spec of an IVF-PQ layout; loud on missing/corrupt
    (including a plain-PQ layout presented at an IVF-PQ read path)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(f"{index_path}_spec").collect()
    except AnalysisException:
        raise ValueError(
            f"{index_path!r} has no persisted spec ({index_path}_spec) — "
            "not a save_ivf_pq_index layout (or a rebuild crashed "
            "mid-write; rebuild)"
        ) from None
    if len(rows) != 1 or rows[0]["format"] != "ivf-pq-v1":
        raise ValueError(
            f"spec at {index_path}_spec is not an IVF-PQ layout "
            f"(expected one 'ivf-pq-v1' row, found {rows!r}) — flat PQ "
            "layouts read through query_pq_index"
        )
    return rows[0].asDict()


def query_ivf_pq_index(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    num_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore: bool = True,
    rescore_factor: int = 8,
    dot_fn=None,
    norm_fn=None,
    rescore_mode: str = "pushdown",
    codebook: PQCodebook | None = None,
) -> DataFrame:
    """Top-k over an IVF-PQ layout: route to the ``num_probes`` nearest
    cells driver-side (centroid table is bounded metadata), scan ONLY
    those cell directories (the cell filter is a partition-column
    predicate), ADC-rank the pruned rows from their m-byte codes, and
    exact-rescore survivors from the float column. With ``num_probes =
    num_centroids`` the result is EXACT under the rescore window — the
    same probe-all guarantee the SQ8 IVF paths pin. ``rescore=True``
    against a ``keep_vec=False`` layout is refused loudly, and a
    preloaded ``codebook=`` must match the spec geometry — both the
    flat-PQ contracts."""
    from cassandra_analytics_spark.operators.similarity import (
        nearest_cells_for,
    )

    if num_probes < 1:
        raise ValueError(f"num_probes must be >= 1, got {num_probes}")
    spec = read_ivf_pq_spec(spark, index_path)
    if rescore and not spec["keep_vec"]:
        raise ValueError(
            f"{index_path!r} was saved with keep_vec=False (codes-only "
            "archival layout) — pass rescore=False, or rebuild with "
            "keep_vec=True"
        )
    if codebook is None:
        rows = spark.read.parquet(f"{index_path}_codebook").collect()
        want = spec["m"] * spec["ks"]
        if len(rows) != want:
            raise ValueError(
                f"corrupt PQ codebook at {index_path}_codebook: spec "
                f"says {want} centroids, found {len(rows)}"
            )
        books: dict[int, dict[int, tuple]] = {}
        for r in rows:
            books.setdefault(r["sub"], {})[r["code"]] = tuple(
                float(v) for v in r["centroid"]
            )
        codebook = PQCodebook(
            dim=spec["dim"], m=spec["m"], ks=spec["ks"],
            centroids=tuple(
                tuple(books[i][j] for j in range(spec["ks"]))
                for i in range(spec["m"])
            ),
        )
    elif (codebook.dim, codebook.m, codebook.ks) != (
        spec["dim"], spec["m"], spec["ks"]
    ):
        raise ValueError(
            f"query_ivf_pq_index: preloaded codebook geometry "
            f"(dim={codebook.dim}, m={codebook.m}, ks={codebook.ks}) "
            f"does not match the layout spec at {index_path!r}"
        )
    centroids = [
        (r.cid, list(r.centroid))
        for r in spark.read.parquet(f"{index_path}_centroids").collect()
    ]
    cells = nearest_cells_for(
        [float(x) for x in query_vec], centroids, num_probes
    )
    qdf = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    return pq_adc_topk(
        qdf, codebook, query_vec, k=k, id_col=id_col,
        vec_col=vec_col if rescore else None,
        rescore_factor=rescore_factor, dot_fn=dot_fn, norm_fn=norm_fn,
        rescore_mode=rescore_mode,
    )
