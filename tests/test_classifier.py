"""Logistic-regression quality classifier: the distributed gradient
pass must match a numpy reference step-for-step, training must
actually separate separable data, and scoring must stay a
zero-exchange projection."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.classifier import (
    QUALITY_FEATURES,
    apply_standardization,
    predict_local,
    quality_features,
    score_logreg,
    standardize_stats,
    train_logreg,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table


def _numpy_logreg(X, y, iters, lr, l2):
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        resid = p - y
        w = w - lr * (X.T @ resid / n + l2 * w)
        b = b - lr * resid.sum() / n
    return w, b


def test_train_matches_numpy(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(400, 3)
    y = (X[:, 0] + 0.5 * X[:, 1] - 0.25 > 0).astype(float)
    rows = [(list(map(float, x)), float(t)) for x, t in zip(X, y)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    w, b = train_logreg(df, dim=3, iters=20, lr=0.5, l2=1e-3)
    wn, bn = _numpy_logreg(X, y, 20, 0.5, 1e-3)
    assert np.allclose(w, wn, atol=1e-9) and abs(b - bn) < 1e-9

    # and it actually separates: >95% accuracy on the training set
    preds = np.array([predict_local(w, b, list(map(float, x))) for x in X])
    assert ((preds > 0.5) == (y > 0.5)).mean() > 0.95


def test_quality_pipeline_end_to_end(spark, sf_small):
    """Train on weak labels derived from the corpus's own signals
    (high stopword ratio = 'quality'), then score: the classifier must
    recover the labeling rule it was trained on (sanity that features,
    training, and scoring compose), and scoring must be map-side."""
    docs = load_table(spark, sf_small, "documents")
    feats = quality_features(docs)
    assert feats.count() == docs.count()
    dim = len(QUALITY_FEATURES)

    labeled = feats.withColumn(
        "label", (F.element_at("features", 3) > 0.05).cast("double"))
    frac = labeled.agg(F.avg("label")).collect()[0][0]
    assert 0.05 < frac < 0.95, f"degenerate weak labels: {frac}"

    means, stds = standardize_stats(labeled, dim=dim)
    w, b = train_logreg(apply_standardization(labeled, means, stds),
                        dim=dim, iters=40, lr=1.0, l2=1e-4)
    scored = score_logreg(apply_standardization(feats, means, stds), w, b) \
        .join(labeled.select("doc_id", "label"), "doc_id")
    acc = (scored.withColumn(
        "hit", ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
        .cast("double")).agg(F.avg("hit")).collect()[0][0])
    assert acc > 0.8, f"classifier failed to fit weak labels: acc={acc}"

    # standardize + score together stay a pure projection pipeline
    plan = score_logreg(apply_standardization(feats, means, stds), w, b) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Scan")[0]  # projection adds none
