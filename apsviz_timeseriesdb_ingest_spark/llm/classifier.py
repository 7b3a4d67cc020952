"""Distributed logistic-regression quality classifier — the GPT-3 /
LLaMA-style learned corpus filter (Brown et al. 2020 §A trains an LR
classifier over text features to score web documents against a
high-quality reference; public papers). fastText-class models are
linear too — this is the same capability expressed Spark-first.

Execution shape mirrors ``similarity.train_kmeans``: the weight vector
lives on the DRIVER (dim+1 doubles), every training pass is one
map-side expression over literal weights plus a single partial-agg
shuffle of dim+1 partial sums — the corpus is never collected and no
per-row state exists. Scoring is a pure projection (sigmoid of an
expanded literal dot), zero exchanges, pipelineable into corpus-prep
the way ``kmeans_assign`` pipelines into the ANN layout write.

Feature extraction reuses the existing relational quality signals
(``text.quality_score`` / ``repetition_stats``) — one tokenizing pass,
no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import quality_score, repetition_stats

QUALITY_FEATURES = ("n_tokens", "mean_word_len", "stopword_ratio",
                    "punct_ratio", "repetition_ratio", "dup_line_frac",
                    "top_bigram_frac")


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, features array<double>) over the standard quality signals.

    ``n_tokens`` is log1p-scaled (raw counts would dominate the linear
    model); everything else is already a bounded ratio. Empty-doc NULL
    ratios coalesce to 0 so the feature vector is always total. One
    join of the two signal passes on the id — both are per-doc.
    """
    q = quality_score(df, text_col, id_col)
    r = repetition_stats(df, text_col, id_col)

    def f(name: str) -> Column:
        return F.coalesce(F.col(name).cast("double"), F.lit(0.0))

    feats = F.array(
        F.log1p(f("n_tokens")),
        f("mean_word_len"),
        f("stopword_ratio"),
        f("punct_ratio"),
        f("repetition_ratio"),
        f("dup_line_frac"),
        f("top_bigram_frac"),
    )
    return (q.join(r.select(id_col, "dup_line_frac", "top_bigram_frac"),
                   id_col)
            .select(id_col, feats.alias("features")))


def standardize_stats(df: DataFrame, *, dim: int,
                      feat_col: str = "features",
                      ) -> tuple[list[float], list[float]]:
    """Per-feature (mean, std) in ONE aggregate pass (dim is small by
    construction, so 2*dim partial sums shuffle — nothing else).
    Zero-variance features get std 1 so scaling stays total."""
    row = df.agg(*[F.avg(F.element_at(F.col(feat_col), j + 1)).alias(f"m{j}")
                   for j in range(dim)],
                 *[F.stddev_pop(F.element_at(F.col(feat_col), j + 1))
                   .alias(f"s{j}") for j in range(dim)]).collect()[0]
    means = [float(row[f"m{j}"]) for j in range(dim)]
    stds = [float(row[f"s{j}"]) or 1.0 for j in range(dim)]
    return means, stds


def apply_standardization(df: DataFrame, means: list[float],
                          stds: list[float], *, feat_col: str = "features",
                          ) -> DataFrame:
    """Map-side (x - mean) / std against literal stats — the same
    frame shape out, so training and scoring share one code path.
    Gradient descent on raw quality features crawls (the log-length
    feature's scale dominates the curvature); standardized, it
    converges in tens of iterations (measured in the tests)."""
    scaled = F.array(*[
        (F.element_at(F.col(feat_col), j + 1) - F.lit(means[j]))
        / F.lit(stds[j]) for j in range(len(means))])
    return df.withColumn(feat_col, scaled)


def _margin_expr(weights: list[float], bias: float, feat: Column) -> Column:
    """w . x + b over literal weights — expanded codegen sum (feature
    dims are small by construction; the janino expansion bound does not
    bind at ~tens of terms)."""
    m = F.lit(float(bias))
    for j, w in enumerate(weights):
        m = m + F.element_at(feat, j + 1) * F.lit(float(w))
    return m


def train_logreg(labeled: DataFrame, *, dim: int, feat_col: str = "features",
                 label_col: str = "label", iters: int = 50, lr: float = 0.5,
                 l2: float = 1e-4) -> tuple[list[float], float]:
    """Batch gradient descent for L2-regularized logistic regression.

    Per iteration: ONE corpus pass computing the dim+1 gradient sums
    ``sum((sigmoid(w.x + b) - y) * x_j)`` map-side against literal
    weights; only those partial sums shuffle. Deterministic (zero init,
    fixed iteration count, no sampling) so retraining is reproducible.
    Returns (weights, bias).
    """
    d = labeled.select(F.col(feat_col).alias("x"),
                       F.col(label_col).cast("double").alias("y"))
    n = d.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        margin = _margin_expr(w, b, F.col("x"))
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("y")
        sums = d.agg(
            *[F.sum(resid * F.element_at(F.col("x"), j + 1)).alias(f"g{j}")
              for j in range(dim)],
            F.sum(resid).alias("gb")).collect()[0]
        w = [wj - lr * (sums[f"g{j}"] / n + l2 * wj)
             for j, wj in enumerate(w)]
        b -= lr * sums["gb"] / n
    return w, b


def score_logreg(df: DataFrame, weights: list[float], bias: float, *,
                 feat_col: str = "features", id_col: str = "doc_id",
                 ) -> DataFrame:
    """(id, quality_prob) — sigmoid of the literal-weight margin; a
    pure projection, zero exchanges."""
    margin = _margin_expr(weights, bias, F.col(feat_col))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return df.select(id_col, prob.alias("quality_prob"))


def predict_local(weights: list[float], bias: float,
                  features: list[float]) -> float:
    """Driver-side twin of :func:`score_logreg` for tests/debugging."""
    m = bias + sum(w * x for w, x in zip(weights, features))
    return 1.0 / (1.0 + math.exp(-m))
