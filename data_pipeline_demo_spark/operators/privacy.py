"""Differentially-private aggregate release (Dwork et al. 2006, the
Laplace mechanism — public literature): noisy per-group counts and
clipped sums for publishing statistics about sensitive data (the
governance sibling of the PII scrub in `textstats`).

Noise here is DETERMINISTIC-SEEDED: the Laplace draw derives from
``xxhash64(group key, seed)`` through the inverse CDF, so releases are
reproducible, replayable across retries, and testable — the same
hash-threshold discipline as `sampling.deterministic_sample`. The
privacy guarantee is the standard one PER RELEASE (epsilon per query;
composing releases composes budgets — callers track the ledger, and a
NEW seed must accompany any re-release, or the "fresh" noise is the
old noise and the two releases pay one budget but leak as one).

Everything is a built-in column expression: hash → uniform → inverse
CDF → add — scan-stream, no shuffle beyond the grouped aggregate
itself, no Python. Scale shape: identical to the plain aggregate; the
noise costs two scalar ops per OUTPUT group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _laplace_noise(key: Column, seed: int, scale: Column) -> Column:
    """Deterministic Laplace(0, scale) from the group key: xxhash64 →
    uniform in (0,1) via the low 52 bits (exact in double) → inverse
    CDF ``-scale·sign(u-½)·ln(1-2|u-½|)``. The (0,1) endpoints are
    excluded by construction (offset ½ ulp at 2⁻⁵³), so ln() never
    sees 0."""
    h = F.xxhash64(key, F.lit(seed))
    mantissa = F.pmod(h, F.lit(2**52)).cast("double")
    u = (mantissa + F.lit(0.5)) / F.lit(float(2**52))  # (0, 1) exclusive
    centered = u - F.lit(0.5)
    return (
        -scale
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """ε-DP per-group counts: true count + Laplace(1/ε) (count has
    sensitivity 1), rounded to the nearest non-negative integer for
    release. Returns ``(*group_cols, noisy_count)`` — the TRUE count
    never leaves this function."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    group_cols = list(group_cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    noise = _laplace_noise(key, seed, F.lit(1.0 / epsilon))
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__true"))
        .select(
            *group_cols,
            F.greatest(
                F.round(F.col("__true") + noise).cast("bigint"), F.lit(0)
            ).alias("noisy_count"),
        )
    )


def dp_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """ε-DP per-group sums with contribution clipping: each value is
    clipped to ``[0, clip]`` BEFORE aggregation (bounding one row's
    influence — the sensitivity), then Laplace(clip/ε) noise is added.
    Returns ``(*group_cols, noisy_sum)``, rounded to 6.

    The clip bound is a privacy parameter, not a data statistic:
    deriving it from the data (e.g. the observed max) silently spends
    budget — pass a fixed policy value."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be positive, got {clip}")
    group_cols = list(group_cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)), F.lit(clip)
    )
    noise = _laplace_noise(key, seed, F.lit(clip / epsilon))
    return (
        df.groupBy(*group_cols)
        .agg(F.sum(clipped).alias("__true"))
        .select(
            *group_cols,
            F.round(F.col("__true") + noise, 6).alias("noisy_sum"),
        )
    )
