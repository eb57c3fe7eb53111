"""In-pipeline document quality classifier: hashed bag-of-words
logistic regression trained BY the engine, ON the cluster, with zero
Python in the per-row path — the fastText-style quality-filter recipe
from public LLM-corpus pipelines (CCNet, LLaMA/GPT-3 data work: train a
small linear model on weak labels, score the whole corpus, keep the
high-probability tail), re-expressed as pure DataFrame algebra.

Why a linear model and not an external library: the feature space is
hashed to a few hundred dims, so the WEIGHTS are broadcast-sized while
the DATA never leaves the cluster. Each full-batch gradient-descent
iteration is two shuffles of built-in operators:

  1. margin pass — sparse features ⋈ broadcast(weights) on feature idx,
     grouped sum per doc → σ(margin), residual (p − y);
  2. gradient pass — features ⋈ residual on doc id, grouped sum per
     feature idx → a ≤(dim+1)-row gradient collected to the driver.

The driver's state is one float vector (dim+1); everything else —
tokenize, hash, TF scaling, sigmoid, sums — is whole-stage-codegen SQL.
100× corpus = 100× scan per iteration, identical shuffle row counts on
the gradient side (bounded by dim), zero driver-proportional data.

Featurization: token → ``pmod(xxhash64(token), dim)`` (the engine's
standard hash), value = term frequency (count / doc length), plus a
bias feature at index ``dim``. Deterministic end-to-end: same corpus +
labels + hyperparameters → bit-identical model on any partition layout
(gradient sums are reassociated floats; tests pin parity to ~1e-9).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Sparse hashed-TF features: ``(id_col, idx, val)`` triples with
    ``idx ∈ [0, dim]`` (``dim`` = the always-on bias feature, val 1.0).
    One explode + one grouped count + one window; no UDF."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = toks.groupBy(
        id_col, F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int").alias("idx")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    dl = F.sum("cnt").over(Window.partitionBy(id_col))
    tf = counts.select(
        id_col, "idx", (F.col("cnt") / dl).alias("val")
    )
    bias = df.select(
        F.col(id_col), F.lit(dim).cast("int").alias("idx"), F.lit(1.0).alias("val")
    )
    return tf.unionByName(bias)


def train_logreg(
    spark: SparkSession,
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    dim: int = 256,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> dict:
    """Full-batch gradient descent for L2-regularized logistic
    regression over hashed text features. ``label_col``: 0/1. Returns
    ``{"weights": [dim+1], "dim": dim}`` (weights[-1] = bias)."""
    n = labeled.count()
    if n == 0:
        raise ValueError("train_logreg: empty training set")
    feats = hashed_features(labeled, text_col, id_col, dim).persist()
    labels = labeled.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    try:
        feats.count()  # materialize once; every iteration reuses it
        w = [0.0] * (dim + 1)
        for _ in range(iters):
            wdf = F.broadcast(
                spark.createDataFrame(
                    [(i, float(wi)) for i, wi in enumerate(w)],
                    "idx int, w double",
                )
            )
            margins = (
                feats.join(wdf, "idx")
                .groupBy(id_col)
                .agg(F.sum(F.col("val") * F.col("w")).alias("__m"))
            )
            resid = margins.join(labels, id_col).select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                    - F.col("__y")
                ).alias("__r"),
            )
            grad_rows = (
                feats.join(resid, id_col)
                .groupBy("idx")
                .agg(F.sum(F.col("val") * F.col("__r")).alias("g"))
                .collect()
            )
            g = [0.0] * (dim + 1)
            for r in grad_rows:
                g[r["idx"]] = r["g"] / n
            w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, g)]
    finally:
        feats.unpersist()
    return {"weights": w, "dim": dim}


def score_logreg(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "prob",
) -> DataFrame:
    """P(label=1) per document through the same broadcast-weights join —
    scoring 100 TB is one featurize + one grouped sum, no UDF, no
    driver involvement beyond the dim-sized weights table."""
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(i, float(wi)) for i, wi in enumerate(model["weights"])],
            "idx int, w double",
        )
    )
    margins = (
        hashed_features(df, text_col, id_col, model["dim"])
        .join(wdf, "idx")
        .groupBy(id_col)
        .agg(F.sum(F.col("val") * F.col("w")).alias("__m"))
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))).alias(out_col),
        )
    )
    return df.join(margins, id_col, "left").fillna({out_col: _sigmoid_bias(model)})


def _sigmoid_bias(model: dict) -> float:
    """Score for a doc with no tokens at all (bias-only margin)."""
    b = model["weights"][-1]
    return 1.0 / (1.0 + math.exp(-b))


def quality_filter_trained(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    dim: int = 256,
    iters: int = 20,
) -> DataFrame:
    """Self-distilled quality gate: weak-label the corpus with the
    heuristic ``textstats.quality_score`` — bottom quartile → 0, top
    quartile → 1, the ambiguous middle EXCLUDED from training (distant
    supervision on confident extremes) — train the hashed LR on those
    labels, score EVERY doc, keep ``prob >= threshold``. The classifier
    generalizes the heuristic's judgment to token evidence the
    heuristic never sees — the public CCNet shape with the engine's own
    heuristic as the teacher. A corpus the heuristic cannot separate at
    all (constant score: lo == hi) passes through unfiltered with
    ``prob`` 1.0 — no signal, no gate."""
    from . import textstats

    scored = df.withColumn("__q", textstats.quality_score(F.col(text_col)))
    lo, hi = scored.approxQuantile("__q", [0.25, 0.75], 0.01)
    if lo >= hi:
        return df.withColumn("prob", F.lit(1.0))
    labeled = scored.filter(
        (F.col("__q") <= lo) | (F.col("__q") >= hi)
    ).withColumn("label", (F.col("__q") >= hi).cast("int"))
    model = train_logreg(
        df.sparkSession,
        labeled,
        text_col=text_col,
        label_col="label",
        id_col=id_col,
        dim=dim,
        iters=iters,
    )
    return (
        score_logreg(df, model, text_col, id_col)
        .filter(F.col("prob") >= threshold)
    )
