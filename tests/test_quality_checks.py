"""Quality-check operators: planted violations are counted exactly and
the publish gate raises on failure."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import quality_checks as qc

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_clean_table_passes_all_checks(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    report = qc.run_checks(
        [
            qc.check_unique(orders, "o_orderkey"),
            qc.check_not_null(orders, ["o_orderkey", "o_custkey"]),
            qc.check_referential(orders, cust, "o_custkey", "c_custkey"),
            qc.check_accepted_values(orders, "o_orderstatus", ["F", "O", "P"]),
        ]
    )
    rows = report.collect()
    assert len(rows) == 4
    assert all(r["ok"] and r["violations"] == 0 for r in rows)
    qc.assert_publishable(report)  # must not raise


def test_planted_violations_are_counted_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (1, "a", 11.0),   # dup key 1 (1 extra row)
            (2, None, 5.0),   # null name
            (2, "b", -3.0),   # dup key 2 + negative value
            (3, "zz", 7.0),   # name outside domain
        ],
        "k long, name string, v double",
    )
    dim = spark.createDataFrame([(1,), (2,)], "k long")

    assert qc.check_unique(df, "k").first()["violations"] == 2
    assert qc.check_not_null(df, "name").first()["violations"] == 1
    # k=3 rows have no dim match
    assert qc.check_referential(df, dim, "k").first()["violations"] == 1
    assert (
        qc.check_accepted_values(df, "name", ["a", "b"]).first()["violations"] == 1
    )
    assert (
        qc.check_accepted_values(df, "name", ["a", "b"], allow_null=False)
        .first()["violations"]
        == 2
    )
    assert qc.check_range(df, "v", lo=0.0).first()["violations"] == 1
    assert qc.check_range(df, "v", lo=0.0, hi=10.5).first()["violations"] == 2


def test_null_keys_still_count_as_duplicates(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "k long")
    assert qc.check_unique(df, "k").first()["violations"] == 1


def test_referential_ignores_null_fact_keys(spark):
    fact = spark.createDataFrame([(None,), (1,), (9,)], "k long")
    dim = spark.createDataFrame([(1,)], "k long")
    assert qc.check_referential(fact, dim, "k").first()["violations"] == 1


def test_publish_gate_raises_with_detail(spark):
    df = spark.createDataFrame([(1,), (1,)], "k long")
    report = qc.run_checks([qc.check_unique(df, "k")])
    with pytest.raises(ValueError, match=r"unique\(k\)=1"):
        qc.assert_publishable(report)


def test_empty_table_is_publishable(spark):
    df = spark.createDataFrame([], "k long, name string")
    report = qc.run_checks(
        [
            qc.check_unique(df, "k"),
            qc.check_not_null(df, "name"),
            qc.check_range(df, "k", lo=0),
        ]
    )
    assert all(r["violations"] == 0 and r["ok"] for r in report.collect())


# --- row-level expectations (DLT surface) ----------------------------------


def _exp_df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, "a"),     # violates nonneg
            (3, 10.0, None),    # violates tag_set (null -> violation)
            (4, -1.0, "zz"),    # violates nonneg AND tag_set
            (5, 3.0, "b"),
        ],
        "id long, amount double, tag string",
    )


def test_expectations_route_and_count(spark):
    from data_pipeline_demo_spark.operators.quality_checks import (
        apply_expectations,
    )

    passed, quarantined, metrics = apply_expectations(
        _exp_df(spark),
        {
            "nonneg": ("amount >= 0", "drop"),
            "tag_set": ("tag IN ('a', 'b')", "quarantine"),
            "id_known": ("id IS NOT NULL", "warn"),
        },
    )
    assert {r.id for r in passed.collect()} == {1, 5}
    q = {r["id"]: sorted(r["__violations"]) for r in quarantined.collect()}
    # 2 failed only the DROP rule: vanishes (not captured)
    assert q == {3: ["tag_set"], 4: ["nonneg", "tag_set"]}
    m = {r.rule: (r.action, r.n_violations) for r in metrics.collect()}
    assert m == {
        "nonneg": ("drop", 2),
        "tag_set": ("quarantine", 2),
        "id_known": ("warn", 0),
    }


def test_expectations_warn_keeps_rows_fail_raises(spark):
    import pytest as _pytest

    from data_pipeline_demo_spark.operators.quality_checks import (
        ExpectationFailedError,
        apply_expectations,
    )

    df = _exp_df(spark)
    passed, _, metrics = apply_expectations(
        df, {"nonneg": ("amount >= 0", "warn")}
    )
    assert passed.count() == 5  # warn never removes
    assert metrics.collect()[0].n_violations == 2
    with _pytest.raises(ExpectationFailedError, match="nonneg \\(2 rows\\)"):
        apply_expectations(df, {"nonneg": ("amount >= 0", "fail")})
    # bad action name refuses
    with _pytest.raises(ValueError, match="action"):
        apply_expectations(df, {"x": ("true", "explode")})


def test_expectations_null_predicate_is_violation(spark):
    from data_pipeline_demo_spark.operators.quality_checks import (
        apply_expectations,
    )

    df = _exp_df(spark)
    # tag IN (...) is NULL for row 3 -> routed out (stricter than SQL
    # CHECK, the right default when routing rows)
    passed, _, _ = apply_expectations(
        df, {"tag_set": ("tag IN ('a', 'b')", "drop")}
    )
    assert {r.id for r in passed.collect()} == {1, 2, 5}
