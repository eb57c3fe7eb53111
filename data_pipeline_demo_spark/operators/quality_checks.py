"""Declarative data-quality constraint checks (publish-gate QA).

The reference's QA is descriptive (row counts, checksums —
`functions/cleaning.qa_aggregates`, data_pipeline.py:689-701); a
pipeline feeding a 100 TB table also needs PRESCRIPTIVE checks that
gate publication: key uniqueness, non-null columns, referential
integrity against dimensions, domain membership. Each check here
compiles to ONE aggregate / anti-join expression tree — no collects,
no row UDFs — and `run_checks` unions every check's one-row verdict
into a single report relation, so an entire suite is one small Spark
job whose output can gate the publish step (`violations == 0`).

Check contract: each function returns a one-row DataFrame
(check STRING, target STRING, violations BIGINT, ok BOOLEAN).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _verdict(df_agg: DataFrame, check: str, target: str) -> DataFrame:
    return df_agg.select(
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("ok"),
    )


def check_unique(df: DataFrame, cols: list[str] | str) -> DataFrame:
    """Violations = rows beyond the first per key (duplicate mass), so a
    clean table reports 0. Null keys count as keys (a duplicated null
    key is still a duplicate). One map-side-combinable aggregate."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    agg = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations"))
    )
    return _verdict(agg, "unique", ",".join(cols))


def check_not_null(df: DataFrame, cols: list[str] | str) -> DataFrame:
    """Violations = total null cells across ``cols`` (one scan, one
    aggregate row — the null-counting pattern of A3)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    total = None
    for c in cols:
        n = F.sum(F.col(c).isNull().cast("long"))
        total = n if total is None else total + n
    agg = df.agg(F.coalesce(total, F.lit(0)).alias("violations"))
    return _verdict(agg, "not_null", ",".join(cols))


def check_referential(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
) -> DataFrame:
    """Violations = fact rows whose non-null key has no dim match (an
    anti-join — broadcast when the dim is small, the same plan shape as
    the ledger probe P4). Null fact keys are not violations; use
    `check_not_null` for that."""
    dim_key = dim_key or fact_key
    orphans = (
        fact.filter(F.col(fact_key).isNotNull())
        .join(
            dim.select(F.col(dim_key).alias(fact_key)).distinct(),
            fact_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return _verdict(orphans, "referential", f"{fact_key}->{dim_key}")


def check_accepted_values(
    df: DataFrame, col: str, accepted: list, allow_null: bool = True
) -> DataFrame:
    """Violations = rows whose value falls outside ``accepted`` (domain
    membership compiles to an IN-list predicate the scan can evaluate)."""
    bad: Column = ~F.col(col).isin(accepted)
    if allow_null:
        bad = bad & F.col(col).isNotNull()
    else:
        bad = bad | F.col(col).isNull()
    agg = df.agg(F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias("violations"))
    return _verdict(agg, "accepted_values", col)


def check_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Violations = non-null values outside [lo, hi] (either bound may
    be open)."""
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (F.col(col) < F.lit(lo))
    if hi is not None:
        bad = bad | (F.col(col) > F.lit(hi))
    agg = df.agg(
        F.coalesce(
            F.sum((bad & F.col(col).isNotNull()).cast("long")), F.lit(0)
        ).alias("violations")
    )
    return _verdict(agg, "range", col)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row verdicts into one report relation. Each check
    is an independent aggregate subtree; Spark runs them as one job."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def assert_publishable(report: DataFrame) -> None:
    """Raise if any check failed — the publish gate. The report is
    check-count-sized (one row per check), so the collect is metadata."""
    failed = [r for r in report.collect() if not r["ok"]]
    if failed:
        detail = "; ".join(f"{r['check']}({r['target']})={r['violations']}" for r in failed)
        raise ValueError(f"quality gate failed: {detail}")
