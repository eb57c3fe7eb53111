"""Bloom-pruned joins: superset/no-false-negative contract, bounded
false-positive rate, and exactness of the re-checked semi-join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import bloom

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_bloom_prune_has_no_false_negatives(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    pruned = bloom.bloom_prune(
        orders, cust, ["o_custkey"], ["c_custkey"]
    )
    exact = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    )
    # every true match survives pruning
    assert exact.join(pruned.select("o_orderkey"), "o_orderkey", "left_anti").count() == 0
    # and pruning is not a no-op: it removed most non-matching rows
    assert pruned.count() < orders.count()


def test_bloom_prune_false_positive_rate_is_bounded(spark):
    # disjoint key spaces: everything surviving is a false positive
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    build = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    pruned = bloom.bloom_prune(
        probe, build, ["k"], num_bits=1 << 20
    )
    # 2^20 bits for 10k items → theoretical fpp well under 1%; allow 2%
    assert pruned.count() <= 400


def test_bloom_semi_join_is_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").filter(
        F.col("s_suppkey") % 7 == 0
    )
    got = bloom.bloom_semi_join(
        li, supp.select(F.col("s_suppkey").alias("l_suppkey")), "l_suppkey",
    )
    want = li.join(
        supp.select(F.col("s_suppkey").alias("l_suppkey")), "l_suppkey", "left_semi"
    )
    assert got.count() == want.count()
    assert got.join(want, got.columns, "left_anti").count() == 0


def test_bloom_prune_composite_key(spark):
    probe = spark.range(0, 5_000).select(
        (F.col("id") % 50).alias("a"), (F.col("id") % 40).alias("b")
    )
    build = spark.range(0, 10).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )
    pruned = bloom.bloom_prune(probe, build, ["a", "b"])
    exact = probe.join(build, ["a", "b"], "left_semi")
    assert exact.join(pruned, ["a", "b"], "left_anti").count() == 0
    assert pruned.count() < probe.count()
