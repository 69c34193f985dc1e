"""Deterministic dataset splitting & sampling for training-data pipelines.

A 100 TB corpus needs train/val/test assignment that is (a) stable across
runs and engines — re-ingesting a document must never move it between
splits (that leaks test data into training), (b) computable row-local —
no shuffle, no global state, (c) skew-free. Content/id hashing gives all
three: split = f(md5(id)), a pure projection that composes with any scan.

``sampleBy`` (seeded Bernoulli per stratum) covers proportional
down-sampling where cross-engine stability isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 is bit-identical everywhere; the first 4 hex chars give 2^16
# uniform buckets — plenty for percent-resolution splits.
_BUCKETS = 100


def hash_bucket(
    col: Column | str, num_buckets: int = _BUCKETS, hex_chars: int = 4
) -> Column:
    """Uniform stable bucket in [0, num_buckets) from md5 of the value's
    string form. Engine-portable (the DuckDB oracle reproduces it exactly:
    ``('0x' || substring(md5(CAST(x AS VARCHAR)), 1, hex_chars))::BIGINT %
    num_buckets``). ``hex_chars`` bounds the modulo bias: 4 chars (2^16
    raw values) suit percent splits; pass 8 when num_buckets is large
    relative to 65536 (see :func:`fine_hash_bucket`)."""
    c = F.col(col) if isinstance(col, str) else col
    hexs = F.substring(F.md5(c.cast("string")), 1, hex_chars)
    return (F.conv(hexs, 16, 10).cast("long") % num_buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Append a stable 'train'/'val'/'test' assignment column.

    Pure projection — no shuffle, no RNG state; the assignment of a row
    depends only on its id, so incremental ingests and re-runs agree.

    A NULL id gets a NULL split — previously SQL null semantics silently
    routed it to 'test' (``when(NULL < 80)`` falls through every branch),
    which LOOKS like an assignment but is an accident; NULL makes the
    broken id visible to the caller (round-8 hostile pass). Percent
    arguments are validated: train+val must fit inside 100.
    """
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"hash_split: need 0 <= train_pct, val_pct and "
            f"train_pct + val_pct <= 100, got {train_pct} + {val_pct}"
        )
    b = hash_bucket(id_col)
    split = (
        F.when(b.isNull(), F.lit(None).cast("string"))
        .when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): one scan, row-local
    coin flips, no shuffle. Deterministic for a fixed seed + partitioning
    within Spark (not portable across engines — pair with
    :func:`hash_split` when cross-run stability matters)."""
    return df.sampleBy(stratum_col, fractions, seed)


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Deterministic per-stratum down-sampling by id-hash: keep a row iff
    ``md5(id) % 100 < fraction*100`` for its stratum.

    Unlike :func:`stratified_sample` (seeded RNG), membership depends only
    on the row's id — stable across runs, engines, partitionings, and
    incremental re-ingests, which is what a 100 TB pipeline actually
    needs (a resumed job must not re-flip coins). Pure projection +
    filter: one scan, no shuffle, engine-portable (the DuckDB oracle
    reproduces the md5 bucket bit-exactly). Unlisted strata sample at 0.
    """
    import math

    bad = {s: f for s, f in fractions.items() if not 0.0 <= f <= 1.0}
    if bad:
        raise ValueError(
            f"stratified_hash_sample: fractions must be in [0, 1], got {bad}"
        )
    b = hash_bucket(id_col)
    keep = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        # For integer buckets, b < frac*100 is equivalent to
        # b < ceil(frac*100) — ceil (not round) so a non-integer percent
        # keeps every bucket strictly below the threshold (0.125 keeps
        # 13 buckets, not round(12.5) == 12). The 1e-6 quantization
        # strips binary-float noise first (0.1*100 == 10.000000000000002
        # must mean 10, not ceil -> 11).
        thr = math.ceil(round(frac * _BUCKETS, 6))
        keep = keep | ((F.col(stratum_col) == stratum) & (b < thr))
    return df.filter(keep)


def fine_hash_bucket(col: Column | str, num_buckets: int = 10_000) -> Column:
    """Stable bucket in [0, num_buckets) from the FIRST 8 md5 hex chars.

    The 4-char default of :func:`hash_bucket` has 2^16 raw values — fine
    for percent splits, but ``% 10000`` over 65536 values over-represents
    buckets below 5536 by 7/6 (a real ~8% skew). Eight chars give 2^32
    raw values, shrinking the modulo bias to ~2e-5. One implementation:
    this is :func:`hash_bucket` with ``hex_chars=8``.
    """
    return hash_bucket(col, num_buckets, hex_chars=8)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    size_col: str | None = None,
    total: float | None = None,
    num_buckets: int = 10_000,
) -> DataFrame:
    """Down-sample a corpus to a target DOMAIN MIXTURE (the static half of
    DoReMi-style domain reweighting): given mixture ratios per domain,
    keep a deterministic id-hash sample of each domain sized so the kept
    corpus follows the ratios.

    ``weights`` are relative ratios over ``size_col`` units (rows when
    ``size_col`` is None); they are normalized internally. The sampled
    total is the largest achievable under the ratios —
    ``X = min_d(available_d / weight_d)`` — further capped by ``total``
    when given; domain d keeps fraction ``weight_d * X / available_d``
    via the md5 id-hash, so membership is stable across runs, engines,
    partitionings and re-ingests (a resumed 100 TB job must never
    re-flip coins). Domains absent from ``weights`` (or weighted 0) are
    dropped entirely.

    Scale shape: one tiny per-domain aggregate (shuffle on the domain
    key, output rows = #domains — collected driver-side, bounded by
    ``len(weights)`` after the weighted-domain filter), then a pure
    projection+filter over the corpus — no second shuffle, no RNG state.

    Oracle parity note: fractions are computed with plain IEEE doubles
    (``(w * X) / S`` then ``ceil(f * num_buckets)``); an engine-portable
    replication must use the same expression tree. Pass pre-normalized
    exact-binary weights (0.5, 0.25, ...) when cross-engine hash
    equality matters — normalization sums floats in dict order.
    """
    import math

    if not weights:
        raise ValueError("mixture_sample needs at least one weighted domain")
    # non-finite weights used to fail DOWNSTREAM of validation (inf: a
    # ZeroDivisionError from a normalized-to-zero sibling; NaN: silently
    # excluded by the w > 0 filter, then misreported as "all weights are
    # zero") — round-9 executed probe. Loud and named instead.
    bad = {
        d: w
        for d, w in weights.items()
        if w < 0 or math.isnan(w) or math.isinf(w)
    }
    if bad:
        raise ValueError(f"mixture weights must be finite and >= 0, got {bad}")
    if total is not None and total <= 0:
        raise ValueError(f"total must be > 0, got {total}")
    active = {d: w for d, w in weights.items() if w > 0}
    if not active:
        raise ValueError("all mixture weights are zero")
    wsum = sum(active.values())
    norm_w = {d: w / wsum for d, w in active.items()}

    size_expr = F.col(size_col) if size_col else F.lit(1)
    rows = (
        df.filter(F.col(domain_col).isin(list(active)))
        .groupBy(F.col(domain_col).alias("d"))
        .agg(
            F.sum(size_expr).cast("double").alias("s"),
            F.count_if(F.col(id_col).isNull()).alias("n_null_ids"),
            F.count_if(size_expr.isNull() | (size_expr < 0)).alias("n_bad_sizes"),
        )
        .collect()
    )
    # NULL sizes silently contribute 0 to the domain's available mass and
    # negative ones SHRINK it, so the keep fractions are computed against
    # a fictitious corpus — and a negative domain total even turns X
    # negative, keeping nothing with no error (round-9 executed probe).
    # Size corruption is data corruption: loud.
    bad_domains = {r["d"]: r["n_bad_sizes"] for r in rows if r["n_bad_sizes"]}
    if bad_domains:
        raise ValueError(
            f"mixture_sample: NULL or negative {size_col!r} values in "
            f"weighted domains {bad_domains} — sizes must be non-negative "
            "and non-NULL; fix or filter them first"
        )
    # a NULL id hashes to a NULL bucket and would be counted in the
    # domain's available size yet silently DROPPED by the keep filter —
    # the achieved mixture undershoots its target with no error (the
    # hash_split NULL-id lesson, round-8 review). Loud instead.
    null_domains = {r["d"]: r["n_null_ids"] for r in rows if r["n_null_ids"]}
    if null_domains:
        raise ValueError(
            f"mixture_sample: NULL {id_col!r} values in weighted domains "
            f"{null_domains} — hash sampling needs non-NULL ids; filter or "
            "fill them first"
        )
    sizes = {r["d"]: r["s"] for r in rows}
    missing = [d for d in active if d not in sizes or not sizes[d]]
    if missing:
        raise ValueError(
            f"mixture domains with no data in {domain_col!r}: {sorted(missing)} "
            "— the requested mixture is unachievable; drop them or fix the corpus"
        )
    x = min(sizes[d] / w for d, w in norm_w.items())
    if total is not None:
        x = min(x, float(total))
    thresholds = {
        d: math.ceil(((w * x) / sizes[d]) * num_buckets)
        for d, w in norm_w.items()
    }
    thr_map = F.create_map(
        *[F.lit(v) for d, t in sorted(thresholds.items()) for v in (d, t)]
    )
    bucket = fine_hash_bucket(id_col, num_buckets)
    # unweighted domains: element_at -> NULL -> NULL comparison -> dropped
    return df.filter(bucket < thr_map[F.col(domain_col)])
