"""IVFPQ composed index: zero-exchange build, partition-pruned probe,
ADC exactness within probed cells vs the PQ reference, and a measured
end-to-end recall floor for the shortlist+rerank search path."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.ivfpq import (
    build_ivfpq_index,
    ivfpq_topk,
)
from apsviz_timeseriesdb_ingest_spark.llm.pq import pq_encode, train_pq
from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
    brute_force_topk,
    kmeans_assign,
    probe_cells_for,
    train_kmeans,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

M, CODES, DIM, K = 8, 16, 64, 8


def _unit_vectors(spark, sf):
    v = load_table(spark, sf, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                             F.lit(0.0), lambda a, x: a + x))
    return v.select("vec_id",
                    F.transform(vec, lambda x: x / nrm).alias("embedding"))


def _trained(spark, sf):
    vecs = _unit_vectors(spark, sf)
    cents = train_kmeans(vecs, k=K, iters=4)
    books = train_pq(vecs, dim=DIM, m=M, codes=CODES, iters=4)
    return vecs, cents, books


def test_ivfpq_index_build_fused_and_consistent(spark, sf_small):
    """The index build is ONE projection (no exchange, no join between
    the cell-assign and encode halves) and agrees with the standalone
    kmeans_assign / pq_encode operators."""
    vecs, cents, books = _trained(spark, sf_small)
    idx = build_ivfpq_index(vecs, cents, books)

    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan

    rows = {r.vec_id: (r.centroid_id, list(r.codes)) for r in idx.collect()}
    assert len(rows) == vecs.count()
    cells = {r.vec_id: r.centroid_id
             for r in kmeans_assign(vecs, cents).collect()}
    codes = {r.vec_id: list(r.codes) for r in pq_encode(vecs, books).collect()}
    assert {k: v[0] for k, v in rows.items()} == cells
    assert {k: v[1] for k, v in rows.items()} == codes
    assert all(0 <= c < CODES for _, cs in rows.values() for c in cs)


def test_ivfpq_probe_prunes_partitions_and_matches_pq_adc(spark, sf_small,
                                                          tmp_path):
    """Probing the stored layout must (a) hit the partition filter and
    (b) return exactly the full-corpus PQ ADC ranking restricted to the
    probed cells (the IVF stage only prunes; ADC scoring is shared)."""
    vecs, cents, books = _trained(spark, sf_small)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    catalog.overwrite(build_ivfpq_index(vecs, cents, books), "ivfpq",
                      partition_by=["centroid_id"])
    index = catalog.read("ivfpq")

    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 5).collect()]
    got = ivfpq_topk(index, books, queries, cents, nprobe=3, top_k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # reference: per query, ADC over the SAME cells via the plain
    # encoded frame (no partitioning involved)
    from apsviz_timeseriesdb_ingest_spark.llm.pq import pq_topk
    cell_map = probe_cells_for(queries, cents, nprobe=3)
    assign = kmeans_assign(vecs, cents)
    got_rows = {(r.query_id, r.neighbor_id, r.rank) for r in got.collect()}
    want_rows = set()
    enc = pq_encode(vecs, books)
    for qid, q in queries:
        ids = {r.vec_id for r in assign.filter(
            F.col("centroid_id").isin(cell_map[qid])).collect()}
        sub = enc.filter(F.col("vec_id").isin(list(ids | {qid})))
        ref = pq_topk(sub, books, [(qid, q)], top_k=5)
        want_rows |= {(r.query_id, r.neighbor_id, r.rank)
                      for r in ref.collect()}
    assert got_rows == want_rows and got_rows

    # pruning really reads fewer files than the full index
    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()

    probed_cells = sorted({c for cs in cell_map.values() for c in cs})
    probed = index.filter(F.col("centroid_id").isin(probed_cells))
    if len(probed_cells) < K:  # data-dependent; only assert when prunable
        assert n_files(probed) < n_files(index)


def test_ivfpq_rerank_recall_floor(spark, sf_small, tmp_path):
    """End-to-end search (nprobe cells -> ADC shortlist -> exact
    re-rank) vs the exact full-scan ranking. The floor is the measured
    value on this deterministic pipeline (bounded above by IVF's own
    nprobe recall), guarding regressions rather than asserting theory."""
    vecs, cents, books = _trained(spark, sf_small)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    catalog.overwrite(build_ivfpq_index(vecs, cents, books), "ivfpq",
                      partition_by=["centroid_id"])
    index = catalog.read("ivfpq")

    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 10).collect()]
    got = ivfpq_topk(index, books, queries, cents, nprobe=4, top_k=3,
                     rerank=vecs, shortlist=50)
    exact = brute_force_topk(vecs, query_ids=[q for q, _ in queries], top_k=3)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.5, f"ivfpq recall@3 collapsed: {recall}"
