"""Bucketed co-located join: the plan property the 100 TB design claims.

The assertion is on the physical plan itself — a bucketed fact-fact join
must contain NO shuffle exchange, while the identical join over plain
parquet needs one per side.
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.bucketed import cojoin, write_bucketed_table
from data_pipeline_demo_spark.sources.tables import table


def _n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is the session factory's scratch default
    # (session.py STATIC_CONFS) — managed tables, dropped on teardown
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        num_buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast on BOTH plans: the property under test is the
    # bucketed sort-merge path (at 100 TB neither fact side broadcasts),
    # not an accidental small-table BroadcastHashJoin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoin(spark, lt, rt, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert plan.count("Bucketed: true") == 2, plan[:2000]
        assert _n_shuffles(joined) == 0, plan[:2000]

        # the same join over plain parquet shuffles both sides
        orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        lineitem = (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .withColumnRenamed("l_orderkey", "o_orderkey")
        )
        plain = orders.join(lineitem, on="o_orderkey")
        assert _n_shuffles(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_same_results(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        cojoin(spark, lt, rt, on="o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
        .collect()[0]
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    want = (
        orders.join(lineitem, on="o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
        .collect()[0]
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"])
