"""HLL sketch rollups (operators/sketches.py): accuracy vs exact,
lossless re-aggregation (day sketches -> month == direct month sketch),
and incremental append-equals-rebuild."""

import pyspark.sql.functions as F

from data_pipeline_demo_spark.operators import sketches
from data_pipeline_demo_spark.sources.tables import table


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.date_trunc("month", "ts").cast("date").alias("month"),
        "user_id",
        "ts",
    )


def test_sketch_estimates_close_to_exact(spark, sf_dir):
    ev = _events(spark, sf_dir)
    est = {
        r["day"]: r["approx_distinct"]
        for r in sketches.estimate(
            sketches.distinct_sketch(ev, ["day"], "user_id")
        ).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for d, n in exact.items():
        assert abs(est[d] - n) <= max(1, 0.05 * n), (d, est[d], n)


def test_sketch_rollup_is_lossless_reaggregation(spark, sf_dir):
    """Union of the stored day sketches to month grain must give the
    IDENTICAL estimate as sketching the raw month directly — the
    register-max algebra, not an approximation of an approximation."""
    ev = _events(spark, sf_dir)
    daily = sketches.distinct_sketch(
        ev.withColumn("month", F.col("month")), ["month", "day"], "user_id"
    )
    via_days = {
        r["month"]: r["approx_distinct"]
        for r in sketches.estimate(
            sketches.sketch_rollup(daily, ["month"])
        ).collect()
    }
    direct = {
        r["month"]: r["approx_distinct"]
        for r in sketches.estimate(
            sketches.distinct_sketch(ev, ["month"], "user_id")
        ).collect()
    }
    assert via_days == direct


def test_sketch_incremental_append_equals_rebuild(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cut = ev.approxQuantile("user_id", [0.5], 0.0)[0]  # arbitrary split
    old_part = ev.filter(F.col("user_id") <= cut)
    new_part = ev.filter(F.col("user_id") > cut)
    merged = sketches.sketch_merge_batches(
        sketches.distinct_sketch(old_part, ["day"], "user_id"),
        sketches.distinct_sketch(new_part, ["day"], "user_id"),
        ["day"],
    )
    rebuilt = sketches.distinct_sketch(ev, ["day"], "user_id")
    got = {
        r["day"]: r["approx_distinct"]
        for r in sketches.estimate(merged).collect()
    }
    want = {
        r["day"]: r["approx_distinct"]
        for r in sketches.estimate(rebuilt).collect()
    }
    assert got == want


def test_sketch_partial_aggregation_plan(spark, sf_dir):
    """The sketch groupBy must map-side partial-aggregate (ObjectHashAggregate
    with partial_merge), not funnel rows through one exchange."""
    ev = _events(spark, sf_dir)
    plan = (
        sketches.distinct_sketch(ev, ["day"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial" in plan.lower()
