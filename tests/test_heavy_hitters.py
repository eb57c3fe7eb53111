"""Mergeable Misra-Gries heavy-hitters sketches (operators/sketches.py):
the carried invariant stored <= true <= stored + err, the presence
guarantee for items with true count > err, exactness below capacity,
rollup-bound preservation, and estimate conservativeness."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import sketches


def _truth(df, group_cols, value_col):
    rows = (
        df.groupBy(*group_cols, F.col(value_col).cast("string").alias("v"))
        .count()
        .collect()
    )
    out: dict = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        out.setdefault(key, {})[r["v"]] = r["count"]
    return out


def _check_bounds(sketch_rows, truth, group_cols):
    for r in sketch_rows:
        key = tuple(r[c] for c in group_cols)
        items = json.loads(r["items"])
        true_counts = truth[key]
        assert r["n"] == sum(true_counts.values())
        for v, stored in items.items():
            t = true_counts.get(v, 0)
            assert stored <= t <= stored + r["err"], (key, v, stored, t, r["err"])
        # presence guarantee: anything bigger than the bound is in
        for v, t in true_counts.items():
            if t > r["err"]:
                assert v in items, (key, v, t, r["err"])


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: item i appears ~ 600/i times, per 2 groups x 2 days
    rows = []
    for g in ("a", "b"):
        for day in (1, 2):
            for i in range(1, 40):
                rows += [(g, day, f"item{i}")] * (600 // i)
    return spark.createDataFrame(rows, "g string, day int, v string")


def test_exact_below_capacity(skewed):
    sk = sketches.heavy_hitters_sketch(skewed, ["g", "day"], "v", k=64)
    rows = sk.collect()
    truth = _truth(skewed, ["g", "day"], "v")
    for r in rows:
        assert r["err"] == 0
        assert json.loads(r["items"]) == truth[(r["g"], r["day"])]


def test_bounds_under_compression(skewed):
    sk = sketches.heavy_hitters_sketch(skewed, ["g", "day"], "v", k=8)
    rows = sk.collect()
    assert all(len(json.loads(r["items"])) <= 8 for r in rows)
    assert all(r["err"] > 0 for r in rows)  # 39 distinct > 8: compressed
    _check_bounds(rows, _truth(skewed, ["g", "day"], "v"), ["g", "day"])


def test_partition_layout_keeps_bounds(skewed):
    truth = _truth(skewed, ["g"], "v")
    for parts in (1, 13):
        sk = sketches.heavy_hitters_sketch(
            skewed.repartition(parts), ["g"], "v", k=8
        )
        _check_bounds(sk.collect(), truth, ["g"])


def test_rollup_preserves_bounds(skewed):
    daily = sketches.heavy_hitters_sketch(skewed, ["g", "day"], "v", k=8)
    monthly = sketches.heavy_hitters_rollup(daily, ["g"], k=8)
    rows = monthly.collect()
    _check_bounds(rows, _truth(skewed, ["g"], "v"), ["g"])
    # the top item must survive the rollup with a nontrivial bound
    for r in rows:
        items = json.loads(r["items"])
        assert "item1" in items
        assert items["item1"] >= 1200 - r["err"]


def test_estimate_is_conservative(skewed):
    sk = sketches.heavy_hitters_sketch(skewed, ["g"], "v", k=8)
    est = sketches.heavy_hitters_estimate(sk, min_share=0.1).collect()
    truth = _truth(skewed, ["g"], "v")
    kept = {(r["g"], r["item"]) for r in est}
    for key, counts in truth.items():
        n = sum(counts.values())
        for v, t in counts.items():
            if t / n >= 0.1:  # true heavy hitter: never dropped
                assert (key[0], v) in kept
    for r in est:
        assert r["count_lo"] <= truth[(r["g"],)][r["item"]] <= r["count_hi"]


def test_null_values_tracked(spark):
    df = spark.createDataFrame(
        [("a", None)] * 50 + [("a", "x")] * 10, "g string, v string"
    )
    sk = sketches.heavy_hitters_sketch(df, ["g"], "v", k=4).collect()
    items = json.loads(sk[0]["items"])
    assert items["\x00null"] == 50 and items["x"] == 10


# --- mergeable quantile sketches ------------------------------------------


def _exact_quantile(vals, q):
    vals = sorted(vals)
    import math

    idx = max(0, min(len(vals) - 1, math.ceil(q * len(vals)) - 1))
    return vals[idx]


def _rank_error(spark_rows, truth_vals, group_key_cols):
    """max |estimated rank - target rank| / n over the estimates."""
    errs = []
    for r in spark_rows:
        vals = sorted(truth_vals[tuple(r[c] for c in group_key_cols)])
        n = len(vals)
        import bisect

        est_rank = bisect.bisect_right(vals, r["value"])
        errs.append(abs(est_rank - r["prob"] * n) / n)
    return max(errs)


@pytest.fixture(scope="module")
def valued(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for g in ("a", "b"):
        for day in (1, 2):
            # mixed distributions so no single shape is privileged
            vals = np.concatenate(
                [
                    rng.uniform(0, 100, 4000),
                    rng.exponential(10, 4000),
                    np.arange(2000),
                ]
            )
            rows += [(g, day, float(v)) for v in vals]
    return spark.createDataFrame(rows, "g string, day int, v double")


def _truth_vals(df, group_cols):
    out = {}
    for r in df.collect():
        out.setdefault(tuple(r[c] for c in group_cols), []).append(r["v"])
    return out


def test_quantile_sketch_rank_error(valued):
    sk = sketches.quantile_sketch(valued, ["g", "day"], "v", k=256)
    est = sketches.quantile_estimate(sk, [0.1, 0.5, 0.9, 0.99]).collect()
    truth = _truth_vals(valued, ["g", "day"])
    assert _rank_error(est, truth, ["g", "day"]) <= 0.02
    # n is exact
    for r in sk.collect():
        assert r["n"] == 10_000


def test_quantile_rollup_preserves_error(valued):
    daily = sketches.quantile_sketch(valued, ["g", "day"], "v", k=256)
    monthly = sketches.quantile_rollup(daily, ["g"], k=256)
    est = sketches.quantile_estimate(monthly, [0.5, 0.95]).collect()
    truth = _truth_vals(valued, ["g"])
    assert _rank_error(est, truth, ["g"]) <= 0.02
    for r in monthly.collect():
        assert r["n"] == 20_000


def test_quantile_partition_layouts_within_bound(valued):
    truth = _truth_vals(valued, ["g"])
    for parts in (2, 17):
        sk = sketches.quantile_sketch(
            valued.repartition(parts), ["g"], "v", k=256
        )
        est = sketches.quantile_estimate(sk, [0.5, 0.9]).collect()
        assert _rank_error(est, truth, ["g"]) <= 0.02


def test_quantile_exact_when_small(spark):
    """Below one level's capacity nothing compacts: estimates are the
    exact order statistics."""
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(100)], "g string, v double"
    )
    sk = sketches.quantile_sketch(df, ["g"], "v", k=256)
    est = {r["prob"]: r["value"] for r in
           sketches.quantile_estimate(sk, [0.01, 0.5, 1.0]).collect()}
    assert est[0.01] == 0.0 and est[0.5] == 49.0 and est[1.0] == 99.0


def test_quantile_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 2.0), ("a", 3.0)],
        "g string, v double",
    )
    sk = sketches.quantile_sketch(df, ["g"], "v")
    assert sk.first()["n"] == 3
    est = sketches.quantile_estimate(sk, [1.0]).first()
    assert est["value"] == 3.0
