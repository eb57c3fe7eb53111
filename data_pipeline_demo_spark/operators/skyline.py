"""Distributed 2-D skyline (Pareto frontier) operator.

The skyline of a relation under (minimize ``x``, maximize ``y``) is the
set of rows no other row dominates: ``d`` dominates ``p`` iff
``d.x <= p.x AND d.y >= p.y`` with at least one inequality strict.
Classic OLAP operator (Börzsönyi et al., "The Skyline Operator",
ICDE 2001); the reference pipeline has no analog — this is engine
surface beyond it, SQL-checkable via the NOT EXISTS dominance oracle.

Scale shape (the reason this is not a self-join): dominance checks via
join are O(n²). Instead:

1. **Per-x reduction** — within equal ``x`` only the max-``y`` row can
   survive, so ``groupBy(x).max(y)`` shrinks the problem to distinct
   ``x`` values (one shuffle, map-side combine).
2. **Batch-local prefilter** — an Arrow-batched ``mapInPandas`` kernel
   sorts each batch by ``x`` and drops rows whose ``y`` does not exceed
   the running max of ``y`` over cheaper-``x`` rows *in that batch*.
   Sound (only provably dominated rows are removed), zero shuffle, and
   on random data leaves O(log batch) candidates per batch — the
   local-skyline half of the standard two-phase distributed plan.
3. **Exact global pass** — the same running-max filter over the
   surviving candidates in one global ``x`` order. The single-partition
   window is safe because step 2 already shrank the input to
   frontier-sized candidates, not the relation.
4. **Row recovery** — join the frontier's (x, y) pairs back to the
   input to emit every original row on the frontier (identical points
   do not dominate each other, so all ties are kept — matching the
   NOT EXISTS semantics bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def _local_prefilter(x_col: str, y_col: str):
    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            s = pdf.sort_values([x_col, y_col], ascending=[True, False])
            run = s[y_col].cummax().shift(1)
            keep = run.isna() | (s[y_col] > run)
            out = s[keep.to_numpy()]
            if len(out):
                yield out

    return kernel


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows not dominated under (minimize ``x_col``, maximize ``y_col``).

    Null and NaN ``x``/``y`` rows are excluded (dominance is undefined
    on unknowns; SQL's NOT EXISTS would silently keep every null row
    as "never dominated", and pandas' running-max treats NaN as
    incomparable where Spark ORDERS it greatest — the only consistent
    contract is to exclude both).
    """
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    for c in (x_col, y_col):
        if dict(df.dtypes).get(c) in ("float", "double"):
            base = base.filter(~F.isnan(F.col(c)))

    # 1. Equal-x reduction: only the max-y row per x can be undominated.
    best = base.groupBy(x_col).agg(F.max(y_col).alias(y_col))

    # 2. Batch-local prefilter (map-only; sound under any partitioning).
    survivors = best.mapInPandas(
        _local_prefilter(x_col, y_col), schema=best.schema
    )

    # 3. Exact global pass on the frontier-sized survivor set. After
    # step 1 every x is distinct, so "rows preceding" == "strictly
    # cheaper x" and the strict > keeps exactly the undominated points.
    w_global = (
        Window.orderBy(F.col(x_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        survivors.withColumn("__runmax", F.max(y_col).over(w_global))
        .filter(
            F.col("__runmax").isNull() | (F.col(y_col) > F.col("__runmax"))
        )
        .drop("__runmax")
    )

    # 4. Recover all original rows on the frontier (ties kept).
    return base.join(frontier, on=[x_col, y_col], how="inner")
