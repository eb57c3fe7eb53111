"""salted_join: exact results under heavy key skew + salt spreading."""

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.skew import salted_join, with_salt


def _skewed_fact(spark, n=20000):
    # 90% of rows hit key 7; the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, on="k", num_salts=8).groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b


def test_salt_spreads_hot_key(spark):
    fact = _skewed_fact(spark)
    salted = with_salt(fact, num_salts=8, salt_by=["v"])
    spread = (
        salted.filter(F.col("k") == 7)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(spread) == 8  # hot key occupies every salt bucket
    counts = [r["count"] for r in spread]
    assert max(counts) < sum(counts) * 0.5  # no salt holds a majority


def test_salt_deterministic(spark):
    fact = _skewed_fact(spark, n=500)
    s1 = {(r["k"], r["v"], r["__salt"]) for r in with_salt(fact, 8, ["v"]).collect()}
    s2 = {(r["k"], r["v"], r["__salt"]) for r in with_salt(fact, 8, ["v"]).collect()}
    assert s1 == s2


def test_salted_join_rejects_dim_preserving_how(spark):
    """right/full/cross would emit each unmatched dim row once per salt
    (the dim side is physically replicated) — the API must refuse."""
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    for how in ("right", "full", "outer", "cross", "full_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, on="k", how=how)
    # fact-preserving shapes still work and stay exact
    assert salted_join(fact, dim, on="k", how="left_semi").count() == 1
    assert salted_join(fact, dim, on="k", how="left_anti").count() == 0


def _with_confs(spark, confs):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE confs really do split a skewed join partition:
    the final adaptive plan marks the sort-merge join skew=true. This is
    the no-code-change path for moderate skew (salted_join is the
    explicit fallback for the pathological tail)."""
    saved = _with_confs(
        spark,
        {
            # force the skew machinery to engage at test scale
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        },
    )
    try:
        fact = _skewed_fact(spark, n=400_000)
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # global agg downstream: no hash-distribution requirement on the
        # join output, so AQE is free to split the skewed partition
        # (a groupBy on the join key would suppress the split — AQE
        # refuses to break a reusable partitioning)
        res = fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore_confs(spark, saved)
