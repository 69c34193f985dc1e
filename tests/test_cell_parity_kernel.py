"""Round-16 optimization: the Arrow parity kernel behind
``nearest_cell_auto`` must be BIT-IDENTICAL to the
``nearest_centroid_cell`` expression — same sims (same fold order),
same highest-cid ties, same -2 pins for NULL/ragged/zero-norm/NaN
inputs — so the "expr" assignment mode can dispatch by work size
without moving a single vector to a different cell.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassandra_analytics_spark.operators.similarity import (
    _CELL_EXPR_MAX_WORK,
    _expr_parity_cell_udf,
    nearest_cell_auto,
    nearest_centroid_cell,
)


def _cells(df, col):
    return {r.vec_id: r.c for r in df.select("vec_id", col.alias("c")).collect()}


def test_parity_on_adversarial_inputs(spark):
    """Ties (duplicate centroids), zero-norm vectors, NaN components,
    ragged lengths and NULL vectors — every branch of the expression's
    semantics, compared value-for-value."""
    nan = float("nan")
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),        # clean, nearest cid 3
        (2, [0.0, 1.0, 0.0, 0.0]),        # EXACT tie between cids 5 and 9
        (3, [0.0, 0.0, 0.0, 0.0]),        # zero norm -> -2 everywhere
        (4, [nan, 1.0, 0.0, 0.0]),        # NaN -> -2 everywhere
        (5, [1.0, 0.0]),                  # ragged -> -2 everywhere
        (6, None),                        # NULL -> -2 everywhere
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cents = [
        (3, [2.0, 0.0, 0.0, 0.0]),
        (5, [0.0, 1.0, 0.0, 0.0]),
        (9, [0.0, 1.0, 0.0, 0.0]),        # duplicate direction of cid 5
    ]
    expr = _cells(emb, nearest_centroid_cell(F.col("embedding"), cents))
    kern = _cells(emb, _expr_parity_cell_udf(cents)(F.col("embedding")))
    assert expr == kern
    # the load-bearing branches, pinned explicitly: exact tie -> highest
    # cid; every -2 row -> highest cid (array_max lexicographic)
    assert expr[2] == 9
    assert expr[3] == expr[4] == expr[5] == expr[6] == 9


def test_parity_on_random_corpus(spark):
    """200 random 16-d vectors x 40 centroids (work 640 > cutoff, the
    dispatch region): assignments must match the expression exactly —
    the fold-order discipline is what keeps near-tie argmaxes stable."""
    import random

    rnd = random.Random(7)
    dim, k = 16, 40
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(200)
    ]
    cents = [(j, [rnd.uniform(-1, 1) for _ in range(dim)]) for j in range(k)]
    assert k * dim > _CELL_EXPR_MAX_WORK
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = _cells(emb, nearest_centroid_cell(F.col("embedding"), cents))
    auto = _cells(emb, nearest_cell_auto(F.col("embedding"), cents))
    assert expr == auto


def test_auto_dispatch_boundary(spark):
    """At or below the work cutoff the plan must stay pure-expression
    (no Python eval node); above it the Arrow kernel must appear."""
    import contextlib
    import io

    emb = spark.range(1).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i)) for i in range(8)]).alias("embedding"),
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    small = [(j, [float(j == i) for i in range(8)]) for j in range(4)]
    big = [(j, [float(j == i) for i in range(8)]) for j in range(80)]
    assert len(small) * 8 <= _CELL_EXPR_MAX_WORK < len(big) * 8
    p_small = plan_of(
        emb.select(nearest_cell_auto(F.col("embedding"), small).alias("c"))
    )
    p_big = plan_of(
        emb.select(nearest_cell_auto(F.col("embedding"), big).alias("c"))
    )
    assert "ArrowEvalPython" not in p_small and "BatchEvalPython" not in p_small
    assert "ArrowEvalPython" in p_big


def _portable_fns():
    """The marked portable-decimal pair and UNMARKED clones (clones
    take the expression path regardless of work size)."""
    from cassandra_analytics_spark.queries.llm import _pdot, _psq_norm

    def pdot_clone(a, b):
        return _pdot(a, b)

    def pnorm_clone(a):
        return _psq_norm(a)

    return _pdot, _psq_norm, pdot_clone, pnorm_clone


def test_scaled_decimal_kernel_parity_random(spark):
    """assign_nearest_cells with the marked portable-decimal math must
    dispatch to the Arrow kernel above the work cutoff and assign every
    vector to the SAME cell as the expression form — the integer-exact
    scaled-decimal reproduction, including near-boundary products
    (values engineered close to .5e-12 rounding boundaries)."""
    import random

    from cassandra_analytics_spark.operators.similarity import (
        assign_nearest_cells,
    )

    pdot, pnorm, pdot_c, pnorm_c = _portable_fns()
    rnd = random.Random(11)
    dim, k = 16, 40  # work 640 > cutoff
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(dim)]) for i in range(150)]
    # adversarial extras: zero vector, NULL, tiny magnitudes (products
    # land near the decimal quantum), a constant vector
    rows += [
        (900, [0.0] * dim),
        (901, None),
        (902, [5.0e-7 * (j + 1) for j in range(dim)]),
        (903, [1.0] * dim),
    ]
    cents = [(j, [rnd.uniform(-2, 2) for _ in range(dim)]) for j in range(k)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kern = {
        r.vec_id: r.cell
        for r in assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot, pnorm
        ).collect()
    }
    expr = {
        r.vec_id: r.cell
        for r in assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot_c, pnorm_c
        ).collect()
    }
    assert kern == expr


def test_scaled_decimal_kernel_plan_dispatch(spark):
    """Marked math above the cutoff -> ArrowEvalPython in the plan;
    below the cutoff (small codebook) -> pure expression."""
    import contextlib
    import io

    from cassandra_analytics_spark.operators.similarity import (
        _CELL_EXPR_MAX_WORK,
        assign_nearest_cells,
    )

    pdot, pnorm, _, _ = _portable_fns()
    emb = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<double>"
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    small = [(j, [float(j == i) for i in range(8)]) for j in range(4)]
    big = [(j, [float(j == i) for i in range(8)]) for j in range(80)]
    assert len(small) * 8 <= _CELL_EXPR_MAX_WORK < len(big) * 8
    p_small = plan_of(
        assign_nearest_cells(emb, small, "vec_id", "embedding", pdot, pnorm)
    )
    p_big = plan_of(
        assign_nearest_cells(emb, big, "vec_id", "embedding", pdot, pnorm)
    )
    assert "ArrowEvalPython" not in p_small
    assert "ArrowEvalPython" in p_big


def test_scaled_decimal_kernel_ragged_raises(spark):
    """The kernel raises the assignment guard's dimension-mismatch
    message (assignment is a verdict path — ragged input is data
    corruption, never a silent lowest-cell)."""
    from cassandra_analytics_spark.operators.similarity import (
        assign_nearest_cells,
    )

    pdot, pnorm, _, _ = _portable_fns()
    cents = [(j, [float(j == i) for i in range(8)]) for j in range(80)]
    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 5)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dimension mismatch"):
        assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot, pnorm
        ).collect()


def test_kernel_rejects_bad_codebook(spark):
    from cassandra_analytics_spark.operators.similarity import (
        validate_codebook,
    )

    with pytest.raises(ValueError):
        validate_codebook([(1, [1.0, 0.0]), (1, [0.0, 1.0])])
    with pytest.raises(ValueError):
        _expr_parity_cell_udf([(1, [1.0, 0.0]), (1, [0.0, 1.0])])


def test_scaled_decimal_kernel_nonfinite_parity(spark):
    """±Inf vector elements (their products cast to NULL under ANSI →
    NULL sims → -2 pin) must assign to the SAME cell as the expression
    form instead of crashing the kernel — the raw fast path used to hit
    Decimal('Infinity').quantize → InvalidOperation (round-16 ADVICE).
    """
    from cassandra_analytics_spark.operators.similarity import (
        assign_nearest_cells,
    )

    pdot, pnorm, pdot_c, pnorm_c = _portable_fns()
    inf = float("inf")
    dim, k = 8, 80  # work 640 > cutoff -> kernel dispatch
    cents = [
        (j, [0.25 * ((i + j) % 4 + 1) for i in range(dim)]) for j in range(k)
    ]
    rows = [
        (1, [inf] + [1.0] * (dim - 1)),   # +Inf -> NULL norm -> all -2
        (2, [-inf] + [0.5] * (dim - 1)),  # -Inf likewise
        (3, [1.0, inf] + [0.0] * (dim - 2)),  # Inf*c stays Inf -> NULL
        (4, [1.0] * dim),                 # clean control row
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kern = {
        r.vec_id: r.cell
        for r in assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot, pnorm
        ).collect()
    }
    expr = {
        r.vec_id: r.cell
        for r in assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot_c, pnorm_c
        ).collect()
    }
    assert kern == expr
    # the Inf rows pin to the LOWEST cid (-2 everywhere), the control
    # row gets a real assignment
    assert kern[1] == kern[2] == kern[3] == min(c for c, _ in cents)


def test_scaled_decimal_kernel_overflow_raises_both(spark):
    """A finite element whose square overflows decimal(28,12) (≥ 1e16
    after HALF_UP) raises NUMERIC_VALUE_OUT_OF_RANGE in BOTH forms —
    the kernel must not silently sum it in float (round-16 ADVICE:
    int53-envelope escape)."""
    from cassandra_analytics_spark.operators.similarity import (
        assign_nearest_cells,
    )

    pdot, pnorm, pdot_c, pnorm_c = _portable_fns()
    dim, k = 8, 80
    cents = [(j, [float(j == i) for i in range(dim)]) for j in range(k)]
    emb = spark.createDataFrame(
        [(1, [1e10] * dim)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot_c, pnorm_c
        ).collect()
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        assign_nearest_cells(
            emb, cents, "vec_id", "embedding", pdot, pnorm
        ).collect()
