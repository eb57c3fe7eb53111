"""PCA dimensionality reduction for embedding columns — the curation
primitive behind cheap ANN tiers, visualization, whitening before
clustering, and shrinking a corpus's vector storage footprint (the
classic public recipe: Pearson 1901 / Hotelling 1933; the distributed
shape below is Spark MLlib's RowMatrix covariance, re-expressed on the
DataFrame runtime without the mllib dependency).

Scale shape (the part that must survive 100 TB):

- **Fit is ONE corpus scan** with a treeAggregate-style partial: each
  Arrow batch contributes ``(n, Σx, XᵀX)`` via a numpy/BLAS matmul
  inside ``mapInPandas`` — the per-partition partial is d + d² floats
  (d=64 → 16 KB) regardless of row count, so the shuffle carries
  O(partitions × d²), never the corpus. The driver folds the partials
  (a few KB each) and runs the d×d eigendecomposition locally —
  embedding dims are 64-4096 in practice, so eigh is microseconds-to-
  seconds and needs no distribution.
- **Transform is map-only**: broadcast the (mean, components) model in
  the UDF closure, one matmul per Arrow batch, no shuffle.

Determinism: eigenvector SIGN is arbitrary in any eigensolver; each
component is canonicalized so its largest-|coefficient| entry is
positive, making fitted models reproducible across runs and partition
layouts (the partial-sum fold is float-associative — variance ratios
are stable to ~1e-7 relative, asserted in tests against a single-node
numpy PCA).

Reference scope: the reference pipeline has no vector operations at
all; this operator serves the engine's LLM-data-curation tier
(SURVEY.md §2.2) alongside kNN/ANN/PQ in ``similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("xtx", ArrayType(DoubleType())),
    ]
)


def pca_fit(
    corpus: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
) -> dict:
    """Fit a k-component PCA over an ``array<float>`` column.

    Returns a plain-python model dict (broadcastable by closure):
    ``{"mean": [d], "components": [k][d] (rows = principal axes,
    descending variance), "explained_variance": [k],
    "explained_variance_ratio": [k], "k": k, "dim": d, "n": rows}``.
    """
    import numpy as np

    def partials(batches):
        import pandas as pd

        n = 0
        s = None
        xtx = None
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if X.size == 0:
                continue
            n += X.shape[0]
            if s is None:
                s = X.sum(axis=0)
                xtx = X.T @ X
            else:
                s += X.sum(axis=0)
                xtx += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
            )

    rows = (
        corpus.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    k = min(k, d)
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        xtx += np.asarray(r["xtx"]).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    evals = np.maximum(evals[order], 0.0)
    # canonical sign: largest-|coeff| entry of each axis is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = max(float(np.trace(cov)), 1e-300)
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": evals.tolist(),
        "explained_variance_ratio": (evals / total_var).tolist(),
        "k": int(k),
        "dim": int(d),
        "n": int(n),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project ``vec_col`` onto the fitted axes: ``(x - mean) @ Wᵀ``,
    optionally whitened (unit variance per axis). Map-only — the model
    travels in the UDF closure (k×d floats), one BLAS matmul per Arrow
    batch, no shuffle, every other column passes through untouched."""
    import numpy as np

    mean = np.asarray(model["mean"])
    W = np.asarray(model["components"])  # (k, d)
    if whiten:
        scale = np.sqrt(np.maximum(np.asarray(model["explained_variance"]), 1e-12))
        W = W / scale[:, None]

    out_fields = [f for f in df.schema.fields if f.name != out_col] + [
        StructField(out_col, ArrayType(FloatType()))
    ]
    schema = StructType(out_fields)
    names = [f.name for f in out_fields]

    def project(batches):
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if X.size:
                P = (X - mean) @ W.T
                pdf = pdf.assign(**{out_col: [r.astype(np.float32) for r in P]})
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf[names]

    return df.mapInPandas(project, schema)


def pca_summary(model: dict) -> list[tuple]:
    """(component, explained_variance, explained_variance_ratio,
    cumulative_ratio) rows for reporting/registry use."""
    out = []
    cum = 0.0
    for i, (ev, r) in enumerate(
        zip(model["explained_variance"], model["explained_variance_ratio"])
    ):
        cum += r
        out.append((i, float(ev), float(r), float(cum)))
    return out


def pca_fit_transform(
    corpus: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> tuple[DataFrame, dict]:
    model = pca_fit(corpus, k=k, vec_col=vec_col)
    return pca_transform(corpus, model, vec_col, out_col, whiten), model
