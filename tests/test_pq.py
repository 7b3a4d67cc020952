"""Product quantization: training improves reconstruction, codes are
well-formed and deterministic, and ADC top-k tracks the exact ranking
on unit-normalized vectors (measured recall floor, not assumed).

One module-scoped training run (iters=8) feeds every test: PQ training
compiles fresh literal-centroid codegen per iteration, which dominates
wall-clock at this corpus size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.pq import (
    pq_encode,
    pq_reconstruction_error,
    pq_topk,
    train_pq,
)
from apsviz_timeseriesdb_ingest_spark.llm.similarity import brute_force_topk
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

M, CODES, DIM = 8, 16, 64


def _unit_vectors(spark, sf):
    v = load_table(spark, sf, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                             F.lit(0.0), lambda a, x: a + x))
    return v.select("vec_id",
                    F.transform(vec, lambda x: x / nrm).alias("embedding"))


@pytest.fixture(scope="module")
def unit_vecs(spark, sf_oracle):
    return _unit_vectors(spark, sf_oracle)


@pytest.fixture(scope="module")
def books8(spark, unit_vecs):
    return train_pq(unit_vecs, dim=DIM, m=M, codes=CODES, iters=8)


def test_training_reduces_reconstruction_error(spark, unit_vecs, books8):
    seeds = train_pq(unit_vecs, dim=DIM, m=M, codes=CODES, iters=0)
    e0 = pq_reconstruction_error(unit_vecs, seeds)
    e1 = pq_reconstruction_error(unit_vecs, books8)
    assert e1 < e0 * 0.8  # Lloyd's must actually move the codebooks
    assert len(books8) == M and len(books8[0]) == CODES
    assert len(books8[0][0]) == DIM // M


def test_encode_shape_range_determinism(spark, unit_vecs, books8):
    enc = pq_encode(unit_vecs, books8)
    rows = enc.collect()
    assert len(rows) == unit_vecs.count()
    for r in rows:
        assert len(r.codes) == M
        assert all(0 <= c < CODES for c in r.codes)
    again = {r.vec_id: list(r.codes)
             for r in pq_encode(unit_vecs, books8).collect()}
    assert again == {r.vec_id: list(r.codes) for r in rows}


def test_pq_topk_recall_floor(spark, unit_vecs, books8):
    """ADC-shortlist + exact re-rank vs the exact cosine ranking on
    unit vectors (where L2 order == cosine order). ADC alone with
    4-bit codes ranks coarsely on these near-orthogonal synthetic
    embeddings (measured ~0.17); the re-rank stage is the operative
    search path. Floors are the measured values on this deterministic
    pipeline, guarding regressions rather than asserting theory."""
    vecs = unit_vecs
    enc = pq_encode(vecs, books8)
    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 10).collect()]
    exact = brute_force_topk(vecs, query_ids=[q for q, _ in queries], top_k=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    reranked = pq_topk(enc, books8, queries, top_k=3,
                       rerank=vecs, shortlist=50)
    rr = {(r.query_id, r.neighbor_id) for r in reranked.collect()}
    recall = len(rr & e) / len(e)
    assert recall >= 0.6, f"reranked recall@3 collapsed: {recall}"

    # re-ranked candidates must come from the ADC shortlist and beat
    # the ADC-only ranking (the stage has to actually add accuracy)
    adc = pq_topk(enc, books8, queries, top_k=3)
    a = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    assert len(rr & e) > len(a & e), "re-rank did not improve on ADC"
