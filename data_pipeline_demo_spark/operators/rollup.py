"""Hypertable-style multi-resolution rollup (continuous-aggregate
cascade) over an event-time table.

The north-star brief names "hypertable rollup" as a custom operator a
training-data pipeline needs. The Spark-first expression is a cascade of
algebraic partial aggregates: the FINEST level scans the raw events
exactly once; every coarser level re-aggregates the previous level's
partials instead of rescanning raw data. At 100 TB the raw scan happens
once per refresh, the hour tier aggregates an input ~60× smaller, the
day tier ~24× smaller again — and each tier is an ordinary shuffle-on-
(bucket, dims) aggregation Catalyst plans with map-side partial
aggregation.

Only algebraic aggregates cascade (count, sum, min, max); avg is
derived at read time as sum/count. Sums are carried as decimal partials
(`functions.numeric.DECIMAL_T`) through every tier — decimal addition
is associative, so re-aggregating partials is EXACTLY equal to
aggregating the raw rows directly, regardless of shuffle order or
cascade depth (asserted level-by-level in tests, and DuckDB-hashable).
A float-double carry would drift: re-aggregation reorders the
additions.

The streaming analog is one `tumbling_counts` job per tier reading the
previous tier's sink (each a normal windowed agg with a watermark);
batch refresh of the cascade is what this module provides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import DECIMAL_T

#: coarse-to-fine ordering sanity check (date_trunc field names)
_LEVEL_ORDER = ("minute", "hour", "day", "week", "month", "quarter", "year")


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    value_col: str = "value",
    levels: Sequence[str] = ("minute", "hour", "day"),
) -> dict[str, DataFrame]:
    """Build the cascade: ``{level: partial-aggregate DataFrame}``.

    Each level carries storage-form partials: ``bucket`` (truncated
    event time), the ``dims``, ``n_events`` (long), ``sum_value``
    (decimal — keep it decimal until :func:`finalize`), ``min_value``,
    ``max_value``. Level N>0 is computed FROM level N-1, never from the
    raw table.
    """
    order = [_LEVEL_ORDER.index(lv) for lv in levels]
    if sorted(order) != order or len(set(order)) != len(order):
        raise ValueError(f"levels must be strictly fine-to-coarse, got {levels}")
    finest = levels[0]
    cur = events.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *dims
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(DECIMAL_T)).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    out = {finest: cur}
    for lvl in levels[1:]:
        cur = cur.groupBy(
            F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *dims
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out[lvl] = cur
    return out


def finalize(level: DataFrame, dims: Sequence[str] = ("event_type",)) -> DataFrame:
    """Read-time projection of a cascade tier: decimal partials become
    doubles, avg is derived from (sum, count)."""
    return level.select(
        "bucket",
        *dims,
        F.col("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
        "min_value",
        "max_value",
    )
