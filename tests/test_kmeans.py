"""Distributed spherical k-means (llm/similarity.train_kmeans) — IVF
centroid training: numpy cross-check, empty-cluster survival, and the
zero-exchange assignment plan."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
    kmeans_assign, train_kmeans)


def _blobs(n_per=40, dim=8, seed=3):
    """Three well-separated unit-vector blobs; ids encode the blob."""
    r = random.Random(seed)
    centers = np.eye(3, dim) * 10
    rows = []
    for b in range(3):
        for i in range(n_per):
            v = centers[b] + np.array([r.gauss(0, 0.3) for _ in range(dim)])
            rows.append((b * 1000 + i, [float(x) for x in v]))
    return rows


def _numpy_spherical_kmeans(X, ids, k, iters):
    """Same algorithm, same deterministic init (k smallest ids), in numpy."""
    order = np.argsort(ids)
    C = X[order[:k]].copy()
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    for _ in range(iters):
        sims = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ C.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            m = X[assign == c]
            if len(m):
                mu = m.mean(axis=0)
                C[c] = mu / np.linalg.norm(mu)
    return C, assign


def test_kmeans_matches_numpy_on_blobs(spark):
    rows = _blobs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = train_kmeans(df, k=3, iters=6)

    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    want, want_assign = _numpy_spherical_kmeans(X, ids, 3, 6)
    # float32 storage + partitioned summation: compare with tolerance
    assert np.allclose(np.array(got), want, atol=1e-4)

    assign = {r.vec_id: r.centroid_id
              for r in kmeans_assign(df, got).collect()}
    # blobs are separated: every member of a blob lands in one cluster,
    # and the three blobs land in three distinct clusters
    blob_clusters = {b: {assign[i] for i, _ in rows if i // 1000 == b}
                     for b in range(3)}
    assert all(len(c) == 1 for c in blob_clusters.values())
    assert len({c.pop() for c in blob_clusters.values()}) == 3


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # Two coincident points + one far seed: with k=3 on 3 points, seeds
    # are the 3 points; the duplicated point's cluster empties one seed.
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = train_kmeans(df, k=3, iters=4)
    assert len(got) == 3
    # seed 2 (duplicate of seed 1) keeps its init centroid: unit [1, 0]
    assert math.isclose(got[1][0], 1.0, abs_tol=1e-9)


def test_kmeans_k_exceeds_corpus(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds corpus size"):
        train_kmeans(df, k=5)


def test_kmeans_assign_is_map_side(spark, sf_small):
    """Trained-centroid assignment must be a pure projection: no Exchange
    (shuffle) anywhere in the physical plan."""
    import contextlib
    import io

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cents = train_kmeans(emb.limit(50), k=4, iters=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kmeans_assign(emb, cents).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_kmeans_on_real_embeddings_deterministic(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    c1 = train_kmeans(emb, k=4, iters=3)
    a1 = sorted(map(tuple, kmeans_assign(emb, c1).collect()))
    a2 = sorted(map(tuple, kmeans_assign(emb, c1).collect()))
    assert a1 == a2
    assert {c for _, c in a1} <= {0, 1, 2, 3}
