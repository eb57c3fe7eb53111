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


# --- Poisson bootstrap ------------------------------------------------------


def test_bootstrap_ci_covers_and_shrinks(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    small = [("s", int(i), float(x)) for i, x in enumerate(rng.normal(10, 2, 50))]
    big = [("b", int(i), float(x)) for i, x in enumerate(rng.normal(10, 2, 2000))]
    df = spark.createDataFrame(small + big, "g string, k long, v double")
    out = {
        r["g"]: r
        for r in privacy.bootstrap_mean_ci(
            df, "g", "v", "k", n_replicas=200, seed=1
        ).collect()
    }
    for g in ("s", "b"):
        r = out[g]
        assert r["ci_lo"] < r["mean"] < r["ci_hi"]
        assert r["ci_lo"] < 10.5 and r["ci_hi"] > 9.5  # near the truth
    # 40x the data -> ~sqrt(40)x tighter interval (generous band)
    w_small = out["s"]["ci_hi"] - out["s"]["ci_lo"]
    w_big = out["b"]["ci_hi"] - out["b"]["ci_lo"]
    assert w_big < w_small / 2.5


def test_bootstrap_ci_deterministic_and_partition_invariant(spark):
    rows = [("g", int(i), float(i % 13)) for i in range(300)]
    df1 = spark.createDataFrame(rows, "g string, k long, v double")
    df8 = df1.repartition(8)
    a = privacy.bootstrap_mean_ci(df1, "g", "v", "k", seed=2).collect()[0]
    b = privacy.bootstrap_mean_ci(df8, "g", "v", "k", seed=2).collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])
    c = privacy.bootstrap_mean_ci(df1, "g", "v", "k", seed=3).collect()[0]
    assert (c["ci_lo"], c["ci_hi"]) != (a["ci_lo"], a["ci_hi"])


def test_bootstrap_rejects_bad_params(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "g string, k long, v double")
    with pytest.raises(ValueError, match="alpha"):
        privacy.bootstrap_mean_ci(df, "g", "v", "k", alpha=1.5)
    with pytest.raises(ValueError, match="replicas"):
        privacy.bootstrap_mean_ci(df, "g", "v", "k", n_replicas=1)


def test_poisson_thresholds_are_poisson1():
    import math

    th = privacy._poisson1_thresholds()
    want = []
    cum = 0.0
    for k in range(8):
        cum += math.exp(-1) / math.factorial(k)
        want.append(cum)
    assert all(abs(a - b) < 1e-12 for a, b in zip(th, want))
    assert th[-1] > 1 - 2e-5  # P[X > 7] ≈ 1.0e-5: cap tail negligible


def test_group_key_null_patterns_draw_distinct_noise(spark):
    """(NULL,'a') and ('a',NULL) are different groups and must NOT
    share a noise draw (concat_ws would collide them — correlated
    noise is a privacy defect)."""
    df = spark.createDataFrame(
        [(None, "a", 1.0)] * 40 + [("a", None, 1.0)] * 40,
        "g1 string, g2 string, v double",
    )
    out = privacy.dp_counts(df, ["g1", "g2"], epsilon=0.4, seed=6).collect()
    assert len(out) == 2
    key = privacy._group_key(["g1", "g2"])
    ks = {r["k"] for r in df.select(key.alias("k")).distinct().collect()}
    assert len(ks) == 2  # injective encoding
