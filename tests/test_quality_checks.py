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
