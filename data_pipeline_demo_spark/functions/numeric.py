"""Deterministic numeric aggregation helpers.

Floating-point ``SUM`` is order-dependent: a distributed Spark sum and a
single-threaded oracle sum over the same doubles differ in the last ulps.
The engine's aggregate surface therefore routes money/measure sums through
an exact decimal accumulator — decimal addition is associative, so any
partitioning/shuffle order yields the *identical* result, which then casts
to double deterministically. This is also the numerically right thing for
payments data (the reference keeps raw float64: SURVEY.md §1.2).

Scale choice is load-bearing in BOTH directions:
- Scale must COVER the data's true decimal precision (price 2dp ×
  discount 2dp × tax 2dp = 6dp): rounding at a position carrying real
  information hits exact .5 ties, where DuckDB's fast double→decimal cast
  (scaled multiply) and Java's exact BigDecimal rounding disagree.
- Scale must keep the SUM's unscaled integer below 2^53, or the final
  decimal→double cast stops being correctly rounded (observed drift at
  scale 18). Scale 6 satisfies both at the sf0.01 correctness gate.

SQL-oracle equivalents (DuckDB):
    exact_sum(x) == CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    exact_avg(x) == CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(30,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(_col(c).cast(DECIMAL_T)).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    col = _col(c)
    return exact_sum(col) / F.count(col)


def sql_sum(expr: str) -> str:
    """The DuckDB-side rendering of :func:`exact_sum` for oracle queries."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_avg(expr: str) -> str:
    return f"{sql_sum(expr)} / COUNT({expr})"
