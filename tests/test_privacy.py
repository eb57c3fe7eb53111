"""Deterministic-seeded Laplace release: reproducibility, noise scale,
clipping, and release hygiene."""

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import privacy
from data_pipeline_demo_spark.sources.tables import table


def test_dp_counts_deterministic_and_integer(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    a = {tuple(r)[:1]: r["noisy_count"] for r in privacy.dp_counts(ev, ["event_type"], epsilon=1.0, seed=3).collect()}
    b = {tuple(r)[:1]: r["noisy_count"] for r in privacy.dp_counts(ev, ["event_type"], epsilon=1.0, seed=3).collect()}
    assert a == b  # replayable release
    c = {tuple(r)[:1]: r["noisy_count"] for r in privacy.dp_counts(ev, ["event_type"], epsilon=1.0, seed=4).collect()}
    assert c != a  # a new seed draws fresh noise
    assert all(v >= 0 for v in a.values())


def test_dp_counts_noise_scale_tracks_epsilon(spark):
    # many single-row groups -> noise sample; |noise| mean ≈ 1/eps
    df = spark.range(4000).select(F.col("id").alias("g"))
    for eps in (0.5, 2.0):
        out = privacy.dp_counts(df, ["g"], epsilon=eps, seed=1).collect()
        errs = [abs(r["noisy_count"] - 1) for r in out]
        mean_err = sum(errs) / len(errs)
        # Laplace(1/eps): E|noise| = 1/eps; rounding to ints biases the
        # small-eps case down a touch — generous band
        assert 0.4 / eps < mean_err + 0.25 < 2.5 / eps


def test_dp_sum_clips_contributions(spark):
    rows = [("a", 1_000_000.0), ("a", 2.0), ("b", -50.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r["noisy_sum"]
        for r in privacy.dp_sum(df, ["g"], "v", clip=10.0, epsilon=5.0, seed=2).collect()
    }
    # a: 10 (clipped) + 2 = 12 ± Laplace(2); b: negative clips to 0
    assert abs(out["a"] - 12.0) < 15.0
    assert abs(out["b"] - 0.0) < 15.0
    assert out["a"] < 100.0  # the million never leaks


def test_dp_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="epsilon"):
        privacy.dp_counts(df, ["g"], epsilon=0)
    with pytest.raises(ValueError, match="clip"):
        privacy.dp_sum(df, ["g"], "v", clip=-1.0)


def test_laplace_inverse_cdf_matches_math(spark):
    """One concrete group: recompute the expected draw in pure python
    from the same hash bits and inverse CDF."""
    df = spark.createDataFrame([("solo", 1.0)], "g string, v double")
    row = privacy.dp_counts(df, ["g"], epsilon=1.0, seed=9).collect()[0]
    h = spark.createDataFrame([("solo",)], "k string").select(
        F.xxhash64("k", F.lit(9)).alias("h")
    ).collect()[0]["h"]
    mantissa = h % 2**52
    u = (mantissa + 0.5) / 2**52
    c = u - 0.5
    noise = -1.0 * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))
    assert row["noisy_count"] == max(0, round(1 + noise))
