"""PCA operator (operators/pca.py): numpy parity of the distributed
one-scan fit, sign determinism, partition-layout invariance, map-only
transform correctness, whitening, and reconstruction-error monotonicity.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import pca


def _corpus(spark, n=200, d=12, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic data: a few dominant directions so the spectrum is
    # well-separated and eigenvector comparison is stable
    basis = rng.normal(size=(d, d))
    scales = np.array([10, 6, 3] + [0.5] * (d - 3))
    X = rng.normal(size=(n, d)) * scales @ basis
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 round-trips through Spark; compare against the SAME data
    X32 = X.astype(np.float32).astype(np.float64)
    return df, X32


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    C = np.cov(X - mean, rowvar=False)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_fit_matches_numpy(spark):
    df, X = _corpus(spark)
    model = pca.pca_fit(df, k=4)
    mean, comps, evals = _numpy_pca(X, 4)
    assert model["n"] == 200 and model["dim"] == 12
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        model["explained_variance"], evals, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model["components"]), comps, rtol=1e-4, atol=1e-6
    )
    ratios = model["explained_variance_ratio"]
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))
    assert 0 < sum(ratios) <= 1 + 1e-9


def test_partition_layout_invariance(spark):
    df, _ = _corpus(spark)
    m1 = pca.pca_fit(df.repartition(1), k=3)
    m7 = pca.pca_fit(df.repartition(7), k=3)
    np.testing.assert_allclose(m1["mean"], m7["mean"], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        m1["components"], m7["components"], rtol=1e-6, atol=1e-8
    )


def test_transform_matches_numpy(spark):
    df, X = _corpus(spark)
    model = pca.pca_fit(df, k=4)
    got = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca.pca_transform(df, model).collect()
    }
    W = np.asarray(model["components"])
    mean = np.asarray(model["mean"])
    want = (X - mean) @ W.T
    for i in range(X.shape[0]):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-4, atol=1e-4)
    # passthrough columns survive
    out = pca.pca_transform(df, model)
    assert set(out.columns) == {"vec_id", "embedding", "pca"}


def test_whiten_unit_variance(spark):
    df, _ = _corpus(spark)
    out, model = pca.pca_fit_transform(df, k=3, whiten=True)
    P = np.asarray([r["pca"] for r in out.collect()], dtype=np.float64)
    np.testing.assert_allclose(P.var(axis=0, ddof=1), 1.0, rtol=1e-3)


def test_reconstruction_error_monotone(spark):
    df, X = _corpus(spark)
    errs = []
    for k in (2, 6, 12):
        model = pca.pca_fit(df, k=k)
        W = np.asarray(model["components"])
        mean = np.asarray(model["mean"])
        P = (X - mean) @ W.T
        errs.append(float(((X - (P @ W + mean)) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-6 * max(errs[0], 1.0)  # full rank: lossless


def test_summary_cumulative(spark):
    df, _ = _corpus(spark)
    model = pca.pca_fit(df, k=5)
    rows = pca.pca_summary(model)
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[-1][3] == pytest.approx(
        sum(model["explained_variance_ratio"]), rel=1e-12
    )


def test_empty_and_degenerate(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca.pca_fit(empty, k=2)
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="at least 2"):
        pca.pca_fit(one, k=2)


def test_q83_runs(spark):
    from data_pipeline_demo_spark.plans import all_queries

    qs, _ = all_queries()
    out = qs["q83_pca_project"](spark, "/root/testdata/sf0.001")
    rows = out.limit(5).collect()
    assert out.columns == ["vec_id", "label", "pc1", "pc2", "var2_share"]
    assert rows and all(r["var2_share"] > 0 for r in rows)
