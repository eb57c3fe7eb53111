"""Per-key time-series forecasting: Holt's linear (double exponential)
smoothing — the capacity-planning primitive ("what will tomorrow's
volume be") a pipeline operator runs over its own throughput series.

Smoothing is inherently SEQUENTIAL per series (each step folds the
previous level/trend), which is exactly the case for Arrow-batched
``applyInPandas``: one Python fold per key over that key's (small)
aggregated series, embarrassingly parallel ACROSS keys, never
row-at-a-time over raw events. The raw stream first collapses to the
per-(key, bucket) aggregate — combinable, map-side — so Python only
ever sees series-length rows.

Public method (Holt 1957; any forecasting textbook):

    level_t = α·y_t + (1−α)·(level_{t−1} + trend_{t−1})
    trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}
    ŷ_{t+h} = level_t + h·trend_t

Validated against an independent numpy fold and on closed-form series
(exact linear series ⇒ exact linear forecasts) in
``tests/test_sql_surface.py``; rows-only at the driver (the sequential
fold has no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    horizon: int = 3,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Forecast the next ``horizon`` buckets of each key's series:
    ``(key, step, forecast, level, trend, n_obs)`` with ``step`` in
    1..horizon, ``level``/``trend`` the final smoothed state, and all
    floats rounded to 6 for stable output. Series with fewer than 2
    observations yield a flat forecast at their single value (trend
    cannot be estimated). Buckets are ordered by ``bucket_col``; gaps
    are treated as consecutive steps (callers wanting strict calendar
    spacing gap-fill first — operators/rollup.py:gapfill_locf)."""
    if not 0 < alpha <= 1 or not 0 <= beta <= 1:
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1, got {alpha}, {beta}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    import pandas as pd

    series = df.groupBy(
        F.col(key_col).alias("__k"), F.col(bucket_col).alias("__b")
    ).agg(F.sum(value_col).alias("__v"))

    schema = (
        f"{key_col} string, step long, forecast double, "
        "level double, trend double, n_obs long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__b")
        key = pdf["__k"].iloc[0]
        ys = pdf["__v"].astype(float).tolist()
        n = len(ys)
        if n == 1:
            level, trend = ys[0], 0.0
        else:
            level, trend = ys[0], ys[1] - ys[0]
            for y in ys[1:]:
                prev = level
                level = alpha * y + (1 - alpha) * (level + trend)
                trend = beta * (level - prev) + (1 - beta) * trend
        rows = [
            (
                str(key),
                h,
                round(level + h * trend, 6),
                round(level, 6),
                round(trend, 6),
                n,
            )
            for h in range(1, horizon + 1)
        ]
        return pd.DataFrame(
            rows,
            columns=[key_col, "step", "forecast", "level", "trend", "n_obs"],
        )

    return series.groupBy("__k").applyInPandas(fold, schema)


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    season_length: int,
    horizon: int = 3,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing — the
    seasonal upgrade of :func:`holt_forecast` (daily/weekly cycles are
    the norm for pipeline throughput series; Holt alone chases the
    season as if it were trend). Public method (Winters 1960):

        level_t = α·(y_t − s_{t−m}) + (1−α)·(level_{t−1} + trend_{t−1})
        trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}
        s_t     = γ·(y_t − level_t) + (1−γ)·s_{t−m}
        ŷ_{t+h} = level_t + h·trend_t + s_{t+h−m·ceil(h/m)}

    Classic initialization over the first two seasons: level = mean of
    season 1, trend = (mean₂ − mean₁)/m, s_i = y_i − mean₁. Series
    shorter than 2·m fall back to Holt's linear recursion with zero
    seasonal components (a too-short series cannot estimate a season;
    refusing would make the operator unusable on ragged key sets —
    the ``seasonal`` flag in the output says which path ran).

    Same scale shape as Holt: raw rows collapse map-side to per-(key,
    bucket) aggregates; the inherently-sequential fold runs once per
    key in an Arrow batch (``applyInPandas``), parallel across keys.
    Output: (key, step, forecast, level, trend, seasonal, n_obs),
    floats rounded to 6. Validated by an independent numpy fold and a
    closed-form test (zero-sum pure-seasonal series reproduce exactly)
    in tests/test_sql_surface.py; rows-only at the driver (sequential
    fold, no SQL twin)."""
    if not 0 < alpha <= 1 or not 0 <= beta <= 1 or not 0 <= gamma <= 1:
        raise ValueError(
            f"need 0<alpha<=1 and beta, gamma in [0,1]; got "
            f"{alpha}, {beta}, {gamma}"
        )
    if season_length < 2:
        raise ValueError(f"season_length must be >= 2, got {season_length}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    import pandas as pd

    m = season_length
    series = df.groupBy(
        F.col(key_col).alias("__k"), F.col(bucket_col).alias("__b")
    ).agg(F.sum(value_col).alias("__v"))

    schema = (
        f"{key_col} string, step long, forecast double, level double, "
        "trend double, seasonal boolean, n_obs long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__b")
        key = pdf["__k"].iloc[0]
        ys = pdf["__v"].astype(float).tolist()
        n = len(ys)
        seasonal = n >= 2 * m
        if not seasonal:
            if n == 1:
                level, trend = ys[0], 0.0
            else:
                level, trend = ys[0], ys[1] - ys[0]
                for y in ys[1:]:
                    prev = level
                    level = alpha * y + (1 - alpha) * (level + trend)
                    trend = beta * (level - prev) + (1 - beta) * trend
            s = [0.0] * m
        else:
            mean1 = sum(ys[:m]) / m
            mean2 = sum(ys[m : 2 * m]) / m
            level, trend = mean1, (mean2 - mean1) / m
            s = [ys[i] - mean1 for i in range(m)]
            for t in range(m, n):
                prev = level
                si = s[t % m]
                level = alpha * (ys[t] - si) + (1 - alpha) * (level + trend)
                trend = beta * (level - prev) + (1 - beta) * trend
                s[t % m] = gamma * (ys[t] - level) + (1 - gamma) * si
        rows = []
        for h in range(1, horizon + 1):
            s_idx = (n + h - 1) % m if seasonal else 0
            s_h = s[s_idx] if seasonal else 0.0
            rows.append(
                (
                    str(key),
                    h,
                    round(level + h * trend + s_h, 6),
                    round(level, 6),
                    round(trend, 6),
                    seasonal,
                    n,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                key_col, "step", "forecast", "level", "trend",
                "seasonal", "n_obs",
            ],
        )

    return series.groupBy("__k").applyInPandas(fold, schema)
