"""Declarative data-quality expectations: named row-level rules →
pass/quarantine split + single-pass metrics.

The reference validates by PRINTING null counts and checksums after
the fact (`/root/reference/data_pipeline.py:430,446,689-701`) and
aborts nothing; the ingest quarantine (`sources/csv_ingest.py`) covers
PARSE failures only. This module is the missing semantic tier — the
shape Deequ / Delta Live Tables expectations standardized (public
systems): a dict of named boolean rules evaluated in ONE map-only
pass, rows failing any rule diverted to a quarantine frame that
carries WHICH rules failed, and per-rule violation counts from one
combinable aggregate.

Scale shape: rule stamping is pure codegen (each rule is a Column
expression — no Python in the hot path); the split is two filters over
one stamped plan (Spark reuses the scan); metrics are map-side
combinable sums. Rules are row-local by design — cross-row checks
compose as separate operators with their own honest shuffles:
``expect_unique`` (one groupBy on the key), ``expect_references``
(broadcast anti-join against the dimension). Streaming: the stamped
split is map-only, so the same rules run per micro-batch inside
``foreachBatch`` unchanged.

Reference scope cite: data_pipeline.py:689-701 (print-based QA).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def _as_col(rule) -> Column:
    return F.expr(rule) if isinstance(rule, str) else rule


def stamp_expectations(df: DataFrame, rules: dict[str, Column | str]) -> DataFrame:
    """Append ``_violations array<string>`` — the names of the rules
    each row FAILS (empty array = clean row). NULL rule results count
    as violations (a rule that cannot evaluate did not pass — the
    conservative reading a quality gate needs)."""
    if not rules:
        raise ValueError("rules must name at least one expectation")
    for name in rules:
        if not name or VIOLATIONS_COL in (name,):
            raise ValueError(f"bad rule name {name!r}")
    failed = [
        F.when(~F.coalesce(_as_col(rule), F.lit(False)), F.lit(name))
        for name, rule in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.filter(F.array(*failed), lambda x: x.isNotNull()),
    )


def expect(
    df: DataFrame,
    rules: dict[str, Column | str],
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (good, quarantine) by the named rules: good
    rows carry the ORIGINAL schema (the gate is transparent to
    downstream operators); quarantine rows keep ``_violations`` so
    triage knows why each row failed. One stamped plan feeds both
    sides — no second scan of the source."""
    stamped = stamp_expectations(df, rules)
    good = stamped.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = stamped.filter(F.size(VIOLATIONS_COL) > 0)
    return good, bad


def expectation_metrics(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """Per-rule readout in ONE combinable aggregate over the stamped
    frame: ``(rule, n_rows, n_violations, violation_rate)``, ordered
    by rule name. The row count repeats per rule so each line is
    self-describing."""
    stamped = stamp_expectations(df, rules)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name in rules:
        aggs.append(
            F.sum(
                F.array_contains(F.col(VIOLATIONS_COL), name).cast("long")
            ).cast("bigint").alias(f"__v_{name}")
        )
    one = stamped.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{name}").alias("n_violations"),
        )
        for name in rules
    ]
    return (
        one.select(F.explode(F.array(*per_rule)).alias("r"))
        .select(
            "r.rule",
            "r.n_rows",
            "r.n_violations",
            F.round(
                F.col("r.n_violations").cast("double")
                / F.col("r.n_rows"),
                6,
            ).alias("violation_rate"),
        )
        .orderBy("rule")
    )


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Cross-row expectation: rows whose key occurs more than once —
    empty result = the uniqueness expectation holds. One groupBy on
    the key columns (map-side combinable count), then a semi join
    back so the caller sees the OFFENDING ROWS, not just keys."""
    if not cols:
        raise ValueError("cols must name at least one column")
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select(*cols)
    )
    return df.join(dups, cols, "left_semi")


def expect_references(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Cross-table expectation (referential integrity): rows whose
    ``col`` value has no match in ``dim[dim_col]`` — empty result =
    the foreign key holds. Broadcast anti-join when the dimension is
    dim-sized (the common case); NULL foreign keys are treated as
    violations (use an explicit NULL-allowing rule if optional)."""
    # NULLs are dropped from the reference key set BEFORE the anti-join:
    # with eqNullSafe a NULL in dim[dim_col] would match NULL foreign
    # keys and silently absolve them, contradicting the contract above.
    keys = (
        dim.select(F.col(dim_col).alias("__ref"))
        .where(F.col(dim_col).isNotNull())
        .dropDuplicates()
    )
    matched = df.join(
        F.broadcast(keys), df[col].eqNullSafe(F.col("__ref")), "left_anti"
    )
    return matched
