"""LLM operator behaviors beyond oracle parity: fast-hash production
path, expr-vs-blas equivalence, multimodal metadata."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.dedup import (
    minhash_lsh_pairs,
    simhash,
)
from apsviz_timeseriesdb_ingest_spark.llm.multimodal import (
    extract_media_features,
    with_binary_payload,
)
from apsviz_timeseriesdb_ingest_spark.llm.similarity import embedding_neardup_pairs
from apsviz_timeseriesdb_ingest_spark.testdata import load_table


def test_minhash_fast_path_finds_planted_dups(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    slow = {tuple(r) for r in minhash_lsh_pairs(docs).collect()}
    fast = {tuple(r) for r in minhash_lsh_pairs(docs, fast=True).collect()}
    # different hash family, same planted near-dups: substantial overlap
    assert slow and fast
    assert len(slow & fast) >= len(slow) * 0.6


def test_simhash_fast_path_runs(spark, sf_small):
    out = simhash(load_table(spark, sf_small, "documents"), fast=True)
    assert out.count() == load_table(spark, sf_small, "documents").count()
    assert out.filter(F.col("simhash") < 0).count() == 0


def test_neardup_expr_equals_blas(spark, sf_small):
    vecs = load_table(spark, sf_small, "embeddings")
    expr = {(r.vec_id_a, r.vec_id_b, r.sim) for r in
            embedding_neardup_pairs(vecs, threshold=0.4, method="expr").collect()}
    blas = {(r.vec_id_a, r.vec_id_b, r.sim) for r in
            embedding_neardup_pairs(vecs, threshold=0.4, method="blas").collect()}
    assert expr == blas


def test_multimodal_metadata_struct(spark, sf_small):
    docs = with_binary_payload(load_table(spark, sf_small, "documents"))
    row = docs.select("media_meta.mime", "media_meta.n_bytes", "payload").first()
    assert row.mime == "application/octet-stream"
    assert row.n_bytes == len(row.payload)
    feats = extract_media_features(docs)
    assert feats.columns == ["doc_id", "n_bytes", "payload_md5", "width",
                             "height", "decoder"]
    f = feats.first()
    assert f.width == f.n_bytes % 640
