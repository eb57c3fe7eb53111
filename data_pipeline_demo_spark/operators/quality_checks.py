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


# --- row-level expectations (the Delta Live Tables surface) ----------------
#
# The checks above gate a TABLE (one verdict row per suite member);
# expectations route individual ROWS: each rule is a SQL predicate a
# row must satisfy, with a per-rule action on violation —
#
#   'warn'       keep the row, count the violation (DLT expect)
#   'drop'       remove the row          (DLT expect_or_drop)
#   'quarantine' remove AND capture it   (the dead-letter pattern the
#                reference hand-rolls as failed-chunk CSVs,
#                data_pipeline.py:559-570)
#   'fail'       abort the job if ANY row violates (DLT expect_or_fail)
#
# One pass, no row Python: every rule evaluates as a column, the
# routing predicate is their conjunction, and the metrics come from a
# single observe()-style aggregate over the same scan.


class ExpectationFailedError(ValueError):
    """A 'fail'-action expectation saw violating rows."""


def apply_expectations(
    df: DataFrame, rules: dict[str, tuple[str, str]]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Route ``df`` through row-level expectations. ``rules`` maps
    rule name → (SQL predicate the row SHOULD satisfy, action ∈
    warn|drop|quarantine|fail). NULL predicate results count as
    violations (a rule you cannot evaluate did not pass — stricter
    than SQL CHECK, the right default for routing).

    Returns ``(passed, quarantined, metrics)``:

    - ``passed``: rows satisfying every drop/quarantine/fail rule
      (warn rules never remove rows);
    - ``quarantined``: rows failing at least one 'quarantine' rule,
      with a ``__violations`` array column naming the rules they
      failed — the dead-letter relation;
    - ``metrics``: one row per rule (rule, action, n_violations) —
      computed in ONE aggregate over the scan.

    'fail' rules raise :class:`ExpectationFailedError` (after the
    metrics pass, so the error message carries exact counts). Rows
    failing BOTH a drop and a quarantine rule quarantine (capture
    beats silent removal)."""
    ok_cols = {}
    for name, (pred, action) in rules.items():
        if action not in ("warn", "drop", "quarantine", "fail"):
            raise ValueError(
                f"expectation {name!r}: action must be "
                f"warn/drop/quarantine/fail, got {action!r}"
            )
        ok_cols[name] = F.coalesce(F.expr(pred), F.lit(False))

    counts = df.agg(
        *[
            F.sum((~ok).cast("long")).alias(name)
            for name, ok in ok_cols.items()
        ]
    ).first()
    metrics = df.sparkSession.createDataFrame(
        [
            (name, rules[name][1], int(counts[name] or 0))
            for name in rules
        ],
        "rule string, action string, n_violations long",
    )
    failed_hard = {
        name: int(counts[name] or 0)
        for name, (p, a) in rules.items()
        if a == "fail" and (counts[name] or 0) > 0
    }
    if failed_hard:
        raise ExpectationFailedError(
            "expectation(s) failed: "
            + ", ".join(f"{n} ({c} rows)" for n, c in sorted(failed_hard.items()))
        )

    removing = {
        n: ok for n, ok in ok_cols.items() if rules[n][1] in ("drop", "quarantine")
    }
    if not removing:
        return df, df.limit(0).withColumn(
            "__violations", F.array().cast("array<string>")
        ), metrics
    keep = None
    for ok in removing.values():
        keep = ok if keep is None else (keep & ok)
    passed = df.filter(keep)
    q_rules = {
        n: ok for n, ok in ok_cols.items() if rules[n][1] == "quarantine"
    }
    viol = F.array_compact(
        F.array(
            *[
                F.when(~ok, F.lit(n))
                for n, ok in ok_cols.items()
                if rules[n][1] in ("drop", "quarantine")
            ]
        )
    )
    quarantined = (
        df.filter(~keep)
        .withColumn("__violations", viol)
        # quarantine only rows that failed at least one QUARANTINE rule;
        # pure drop-rule failures vanish (their counts are in metrics)
        .filter(
            F.arrays_overlap(
                "__violations",
                F.array(*[F.lit(n) for n in q_rules]) if q_rules else F.array().cast("array<string>"),
            )
        )
    )
    return passed, quarantined, metrics
