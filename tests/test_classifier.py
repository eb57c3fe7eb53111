"""Trained quality classifier (operators/classifier.py): featurization
parity by hand, numpy gradient-descent parity, separable-corpus
accuracy, partition invariance, scoring determinism, and the no-UDF
plan property."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import classifier


GOOD = ["insight", "analysis", "report", "study", "method", "result"]
SPAM = ["buy", "click", "free", "winner", "casino", "pills"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        words = [GOOD[(i + j) % len(GOOD)] for j in range(8)]
        rows.append((i, " ".join(words), 1))
    for i in range(120, 240):
        words = [SPAM[(i + j) % len(SPAM)] for j in range(8)]
        rows.append((i, " ".join(words), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_by_hand(spark):
    df = spark.createDataFrame(
        [(0, "a b a")], "doc_id long, text string"
    )
    feats = classifier.hashed_features(df, dim=16).collect()
    by_idx = {}
    for r in feats:
        by_idx[r["idx"]] = by_idx.get(r["idx"], 0.0) + r["val"]
    assert by_idx.pop(16) == 1.0  # bias
    # "a" twice, "b" once, TF = 2/3 and 1/3 (possibly colliding)
    assert sum(by_idx.values()) == pytest.approx(1.0)
    assert sorted(v for v in by_idx.values()) in (
        [pytest.approx(1 / 3), pytest.approx(2 / 3)],
        [pytest.approx(1.0)],  # full collision
    )


def test_train_matches_numpy(spark):
    """The distributed GD must match a single-node numpy implementation
    of the identical algorithm on the identical hashed features."""
    rows = [
        (0, "good great fine", 1),
        (1, "good nice fine", 1),
        (2, "bad awful spam", 0),
        (3, "bad spam junk", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    dim, iters, lr, l2 = 32, 10, 1.0, 1e-3
    model = classifier.train_logreg(
        spark, df, dim=dim, iters=iters, lr=lr, l2=l2
    )

    feats = classifier.hashed_features(df, dim=dim).collect()
    X = np.zeros((4, dim + 1))
    for r in feats:
        X[r["doc_id"], r["idx"]] += r["val"]
    y = np.array([1.0, 1.0, 0.0, 0.0])
    w = np.zeros(dim + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / 4
        w = w - lr * (g + l2 * w)
    np.testing.assert_allclose(model["weights"], w, rtol=1e-9, atol=1e-12)


def test_separable_corpus_high_accuracy(corpus):
    model = classifier.train_logreg(
        corpus.sparkSession, corpus, dim=128, iters=25
    )
    scored = classifier.score_logreg(corpus, model)
    acc = (
        scored.select(
            ((F.col("prob") >= 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.99


def test_partition_invariance(corpus):
    spark = corpus.sparkSession
    m1 = classifier.train_logreg(corpus.repartition(1), corpus.repartition(1), dim=64, iters=5) if False else None
    a = classifier.train_logreg(spark, corpus.repartition(2), dim=64, iters=5)
    b = classifier.train_logreg(spark, corpus.repartition(11), dim=64, iters=5)
    np.testing.assert_allclose(a["weights"], b["weights"], rtol=1e-9, atol=1e-12)


def test_empty_doc_gets_bias_score(spark):
    model = {"weights": [0.0] * 8 + [2.0], "dim": 8}
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    got = classifier.score_logreg(df, model).first()["prob"]
    # "" tokenizes to one empty token; margin = tf·w_h("") + bias
    assert 0.0 < got < 1.0


def test_quality_filter_trained_end_to_end(spark):
    """Corpus the HEURISTIC teacher separates (length + punct + stopword
    signals): prose docs vs shouty short spam. The trained student must
    keep mostly prose and drop mostly spam."""
    prose = (
        "the study presents a detailed analysis of the results and the "
        "method is described in the report with further discussion"
    )
    spam = "BUY!!! CLICK!!! FREE!!!"
    rows = [(i, prose + f" section {i}") for i in range(60)] + [
        (1000 + i, spam) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = classifier.quality_filter_trained(df, dim=128, iters=15)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    prose_kept = sum(1 for i in ids if i < 1000)
    spam_kept = sum(1 for i in ids if i >= 1000)
    assert prose_kept >= 55 and spam_kept <= 5
    assert set(kept.columns) == {"doc_id", "text", "prob"}


def test_scoring_plan_is_udf_free(corpus):
    model = {"weights": [0.1] * 129, "dim": 128}
    plan = (
        classifier.score_logreg(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
