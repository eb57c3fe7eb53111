"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern this enables: COUNT(DISTINCT x) does not re-aggregate
— a month's distinct users is not the sum of 30 daily counts — so a
rollup hierarchy over raw data must either re-scan history per grain or
store the raw keys. Register-level HLL sketches ARE re-aggregatable:
store one small binary sketch per fine-grain group, union sketches (a
lossless register max at equal ``lg_k``) to any coarser grain, estimate
at read time. History is never re-scanned; incremental maintenance is a
union with the new batch's sketches.

All JVM-side datasketches expressions — no Python in the data path; the
union is combinable, so every groupBy here map-side partial-aggregates.

Reference scope note: the reference computes only whole-frame exact
counts (`/root/reference/data_pipeline.py:664-707`); this extends the
aggregation family to the approximate re-aggregatable tier the same way
``approx_count_distinct`` (q56) does, but with PERSISTENT, mergeable
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` — the fine-grain
    state a sketch rollup stores (a few KB per group at lg_k=12,
    independent of group cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias(sketch_col)
    )


def sketch_rollup(
    sketches: DataFrame,
    to_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain: register-level
    union, lossless at equal lg_k — the estimate at the coarse grain is
    IDENTICAL to sketching the raw data directly (tested), but no raw
    data is touched."""
    return sketches.groupBy(*to_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def sketch_merge_batches(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Incremental maintenance: fold a new batch's sketches into the
    stored ones (union per key). O(groups touched), never O(history);
    append-equals-rebuild is the tested invariant."""
    return (
        old.unionByName(new)
        .groupBy(*keys)
        .agg(F.hll_union_agg(sketch_col).alias(sketch_col))
    )


def estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Read-time estimate; the sketch column is dropped."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)
