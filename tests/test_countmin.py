"""Count-Min sketch: never-undercount + εN overcount bound, rollup
bit-equality with direct coarse sketching, bounded state, null
handling — all on deterministic data (fixed hash seed ⇒ reproducible
estimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.sketches import (
    countmin_estimate,
    countmin_rollup,
    countmin_sketch,
)


def _skewed(spark):
    """Zipf-ish stream: item i appears ~1000/i times, two groups."""
    rows = []
    for g in ("a", "b"):
        for i in range(1, 60):
            rows += [(g, f"item{i}")] * (1000 // i)
    return spark.createDataFrame(rows, "grp string, v string")


def test_countmin_never_undercounts_and_bounds_overcount(spark):
    df = _skewed(spark)
    width, depth = 512, 5
    sk = countmin_sketch(df, ["grp"], "v", width=width, depth=depth)
    true = {
        (r.grp, r.v): r.n
        for r in df.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = df.select("grp", "v").distinct()
    est = {
        (r.grp, r.v): r.est
        for r in countmin_estimate(
            sk, probes, ["grp"], "v", width=width, depth=depth
        ).collect()
    }
    n_per_group = sum(1000 // i for i in range(1, 60))
    for key, t in true.items():
        assert est[key] >= t, key  # the one-sided guarantee
        # ε = e/width; allow 2εN slack — deterministic data, so this is
        # a fixed observable, not a flaky probabilistic assertion
        assert est[key] - t <= 2 * 2.7183 / width * n_per_group, key


def test_countmin_rollup_equals_direct(spark):
    """Counter-wise day→total rollup is BIT-EQUAL to sketching the
    whole stream directly — the mergeability proof, exact not
    approximate."""
    df = _skewed(spark).withColumn(
        "day", F.when(F.length("v") % 2 == 0, "d1").otherwise("d2")
    )
    by_day = countmin_sketch(df, ["grp", "day"], "v", width=256, depth=4)
    rolled = countmin_rollup(by_day, ["grp"])
    direct = countmin_sketch(df, ["grp"], "v", width=256, depth=4)
    a = {
        (r.grp, r.cm_depth, r.cm_pos): r.cm_cnt for r in rolled.collect()
    }
    b = {
        (r.grp, r.cm_depth, r.cm_pos): r.cm_cnt for r in direct.collect()
    }
    assert a == b


def test_countmin_state_bounded_and_exact_small(spark):
    df = spark.createDataFrame(
        [("g", "x")] * 7 + [("g", "y")] * 3 + [("g", None)] * 2,
        "grp string, v string",
    )
    sk = countmin_sketch(df, ["grp"], "v", width=64, depth=4)
    assert sk.count() <= 4 * 64
    probes = spark.createDataFrame(
        [("g", "x"), ("g", "y"), ("g", None), ("g", "absent")],
        "grp string, v string",
    )
    est = {
        r.v: r.est
        for r in countmin_estimate(
            sk, probes, ["grp"], "v", width=64, depth=4
        ).collect()
    }
    # 3 distinct values in a 64-wide row: collisions would need a
    # same-row hash clash on this fixed seed — verified exact here
    assert est["x"] == 7 and est["y"] == 3 and est[None] == 2
    assert est["absent"] == 0  # min over depth hits an empty counter


def test_countmin_plan_pure_builtins(spark):
    """The sketch build must be one explode + one combinable hash
    aggregate — no Python evaluation anywhere in the plan."""
    df = _skewed(spark)
    sk = countmin_sketch(df, ["grp"], "v", width=128, depth=3)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan
