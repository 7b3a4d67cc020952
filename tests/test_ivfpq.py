"""IVFPQ composed index: zero-exchange build, partition-pruned probe,
ADC exactness within probed cells vs the PQ reference, and a measured
end-to-end recall floor for the shortlist+rerank search path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.ivfpq import (
    build_ivfpq_index,
    ivfpq_topk,
    residuals,
)
from apsviz_timeseriesdb_ingest_spark.llm.pq import (
    pq_encode,
    pq_reconstruction_error,
    train_pq,
)
from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
    brute_force_topk,
    kmeans_assign,
    probe_cells_for,
    train_kmeans,
    write_ann_layout,
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


@pytest.fixture(scope="module")
def trained(spark, sf_small):
    """One shared training run for the whole module: k-means + PQ
    training dominate wall-clock (per-iteration janino compiles of the
    literal-centroid expressions), and every test here consumes the
    same deterministic artifacts."""
    vecs = _unit_vectors(spark, sf_small)
    cents = train_kmeans(vecs, k=K, iters=4)
    books = train_pq(vecs, dim=DIM, m=M, codes=CODES, iters=4)
    return vecs, cents, books


@pytest.fixture(scope="module")
def trained_residual(spark, trained):
    vecs, cents, _ = trained
    return train_pq(residuals(vecs, cents), dim=DIM, m=M, codes=CODES,
                    iters=4)


def test_ivfpq_index_build_fused_and_consistent(spark, trained):
    """The index build is ONE projection (no exchange, no join between
    the cell-assign and encode halves) and agrees with the standalone
    kmeans_assign / pq_encode operators."""
    vecs, cents, books = trained
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


def test_ivfpq_probe_prunes_partitions_and_matches_pq_adc(spark, trained,
                                                          tmp_path):
    """Probing the stored layout must (a) hit the partition filter and
    (b) return exactly the full-corpus PQ ADC ranking restricted to the
    probed cells (the IVF stage only prunes; ADC scoring is shared)."""
    vecs, cents, books = trained
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(catalog, build_ivfpq_index(vecs, cents, books),
                     "ivfpq", k=K)
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


def test_ivfpq_rerank_recall_floor(spark, trained, tmp_path):
    """End-to-end search (nprobe cells -> ADC shortlist -> exact
    re-rank) vs the exact full-scan ranking. The floor is the measured
    value on this deterministic pipeline (bounded above by IVF's own
    nprobe recall), guarding regressions rather than asserting theory."""
    vecs, cents, books = trained
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(catalog, build_ivfpq_index(vecs, cents, books),
                     "ivfpq", k=K)
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


def test_residual_encoding_measured_and_matches_numpy(
        spark, trained, trained_residual):
    """The Spark residual codes must equal a numpy recompute of
    cell -> residual -> per-subspace argmin, and both encodings must
    actually learn (error bounded). The textbook 'residual
    reconstructs tighter' claim is deliberately NOT asserted: on these
    near-random synthetic embeddings the spherical cells are weak and
    residual encoding measures ~1.3x WORSE reconstruction (see the
    module docstring) — the data decides, the test just pins that both
    paths compute what they claim."""
    import numpy as np

    vecs, cents, books_raw = trained
    res = residuals(vecs, cents)
    books_res = trained_residual
    err_raw = pq_reconstruction_error(vecs, books_raw)
    err_res = pq_reconstruction_error(res, books_res)
    # unit vectors: total variance ~1; any trained codebook must beat it
    assert 0 < err_raw < 1.0 and 0 < err_res < 1.0, (err_raw, err_res)

    idx = build_ivfpq_index(vecs, cents, books_res, residual=True)
    got = {r.vec_id: (r.centroid_id, list(r.codes)) for r in idx.collect()}

    rows = sorted(vecs.collect(), key=lambda r: r.vec_id)
    data = np.array([r.embedding for r in rows])
    ids = [r.vec_id for r in rows]
    C = np.array(cents)
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0
    B = np.array(books_res)
    sd = DIM // M
    sims = (data @ C.T) / (np.linalg.norm(data, axis=1, keepdims=True) * Cn)
    cell = sims.argmax(1)  # ties impossible on this data; smallest-id o/w
    R = data - C[cell]
    for i, vid in enumerate(ids):
        want_codes = [int(((R[i, s * sd:(s + 1) * sd] - B[s]) ** 2)
                          .sum(-1).argmin()) for s in range(M)]
        assert got[vid] == (int(cell[i]), want_codes), vid


def test_residual_search_end_to_end_recall_floor(spark, trained,
                                                 trained_residual, tmp_path):
    """Same probe geometry, same shortlist, both encodings searched
    end-to-end: each must clear a measured recall floor (the re-rank
    stage absorbs most of the ADC quality difference — raw vs residual
    shortlists differ, final recall floors are what users feel)."""
    vecs, cents, books_raw = trained
    books_res = trained_residual
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(catalog, build_ivfpq_index(vecs, cents, books_raw),
                     "raw", k=K)
    write_ann_layout(catalog,
                     build_ivfpq_index(vecs, cents, books_res,
                                       residual=True), "res", k=K)
    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 10).collect()]
    exact = brute_force_topk(vecs, query_ids=[q for q, _ in queries], top_k=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    def hits(table, books, residual):
        got = ivfpq_topk(catalog.read(table), books, queries, cents,
                         nprobe=4, top_k=3, rerank=vecs, shortlist=50,
                         residual=residual)
        return len({(r.query_id, r.neighbor_id)
                    for r in got.collect()} & e)

    raw_hits = hits("raw", books_raw, False)
    res_hits = hits("res", books_res, True)
    assert raw_hits / len(e) >= 0.5, f"raw recall collapsed: {raw_hits}"
    assert res_hits / len(e) >= 0.4, f"residual recall collapsed: {res_hits}"


def test_ivfpq_grouped_layout_identical_and_pruned(spark, trained,
                                                   tmp_path):
    """r8 verdict task 2 — the bounded-directory grouped layout,
    extended to the IVF+PQ codes table: build_ivfpq_index(
    partition_groups=G) + partition_by=(cell_group,) bounds directory
    count at G for any k, ivfpq_topk(group_col=, groups=) returns
    IDENTICAL top-k, and the grouped plan keeps both pruning levels
    (directory filter on the group, cell predicate in parquet
    row-group stats) — mirroring
    test_grouped_layout_probe_identical_and_pruned."""
    import os

    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        cell_group_span)

    vecs, cents, books = trained
    G = 3  # span = ceil(8/3) = 3: cells 0-2 / 3-5 / 6-7
    assert cell_group_span(K, G) == 3
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(catalog, build_ivfpq_index(vecs, cents, books),
                     "flat", k=K)
    # build_ivfpq_index(partition_groups=G) already derives cell_group;
    # write_ann_layout recomputes the identical column and pins (k, G)
    write_ann_layout(
        catalog, build_ivfpq_index(vecs, cents, books, partition_groups=G),
        "grouped", k=K, partition_groups=G)

    # directory count bounded at G; per-cell layout has one per cell
    def dirs(table, prefix):
        return [d for d in os.listdir(catalog.path(table))
                if d.startswith(prefix)]
    assert len(dirs("grouped", "cell_group=")) <= G
    assert len(dirs("flat", "centroid_id=")) > G

    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 5).collect()]
    flat = ivfpq_topk(catalog.read("flat"), books, queries, cents,
                      nprobe=3, top_k=5)
    gp = ivfpq_topk(catalog.read("grouped"), books, queries, cents,
                    nprobe=3, top_k=5, group_col="cell_group", groups=G)
    assert (sorted(map(tuple, gp.collect()))
            == sorted(map(tuple, flat.collect())))

    # both pruning levels in the grouped plan
    plan = gp._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:300]
    assert "cell_group" in pf
    assert "PushedFilters" in plan and "centroid_id" in plan.split(
        "PushedFilters")[1][:300]

    # rerank path composes with the grouped probe unchanged
    gp_rr = ivfpq_topk(catalog.read("grouped"), books, queries, cents,
                       nprobe=3, top_k=3, rerank=vecs, shortlist=10,
                       group_col="cell_group", groups=G)
    fl_rr = ivfpq_topk(catalog.read("flat"), books, queries, cents,
                       nprobe=3, top_k=3, rerank=vecs, shortlist=10)
    assert (sorted(map(tuple, gp_rr.collect()))
            == sorted(map(tuple, fl_rr.collect())))

    # a per-cell table probed with group_col= fails with the targeted
    # error, not a generic missing-column AnalysisException
    with pytest.raises(ValueError, match="no 'cell_group' column"):
        ivfpq_topk(catalog.read("flat"), books, queries, cents,
                   group_col="cell_group", groups=G)


def test_ivfpq_catalog_table_overload(spark, trained, tmp_path):
    """r10 (r9 verdict task 4): ivfpq_topk((catalog, table), ...) opens
    the codes table through its sidecar — geometry from the pin, never
    the caller; conflicting caller config raises."""
    vecs, cents, books = trained
    G = 3
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(
        catalog, build_ivfpq_index(vecs, cents, books, partition_groups=G),
        "grouped", k=K, partition_groups=G)
    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 5).collect()]
    via_pin = ivfpq_topk((catalog, "grouped"), books, queries, cents,
                         nprobe=3, top_k=5)
    explicit = ivfpq_topk(catalog.read("grouped"), books, queries, cents,
                          nprobe=3, top_k=5, group_col="cell_group",
                          groups=G)
    assert (sorted(map(tuple, via_pin.collect()))
            == sorted(map(tuple, explicit.collect())))
    with pytest.raises(ValueError, match="authoritative"):
        ivfpq_topk((catalog, "grouped"), books, queries, cents,
                   nprobe=3, top_k=5, groups=G + 1)


def test_ivfpq_topk_via_centroid_index(spark, trained, trained_residual,
                                       tmp_path):
    """r10: ivfpq_topk(centroid_index=) — query probe AND the residual
    LUT centroids come from the index state (bounded fetch of the
    probed cells from a from_frame table), never a driver-held k-sized
    list; results identical to the literal path for raw and residual
    encodings."""
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        CentroidTable,
    )

    vecs, cents, books = trained
    books_res = trained_residual
    catalog = Catalog(spark, str(tmp_path / "wh"))
    write_ann_layout(catalog, build_ivfpq_index(vecs, cents, books),
                     "raw", k=K)
    write_ann_layout(catalog,
                     build_ivfpq_index(vecs, cents, books_res,
                                       residual=True), "res", k=K)
    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 5).collect()]

    # from_frame table: holds NO driver-side centroid list at all
    cent_frame = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, cvec array<double>")
    tbl = CentroidTable.from_frame(cent_frame, nprobe=10**6)
    assert tbl.centroids is None

    for table, bk, res in (("raw", books, False), ("res", books_res, True)):
        lit = sorted(map(tuple, ivfpq_topk(
            catalog.read(table), bk, queries, cents, nprobe=3, top_k=5,
            residual=res).collect()))
        via = sorted(map(tuple, ivfpq_topk(
            catalog.read(table), bk, queries, nprobe=3, top_k=5,
            residual=res, centroid_index=tbl).collect()))
        assert via == lit, table
    tbl.unpersist()

    import pytest
    with pytest.raises(ValueError, match="centroids= .* or"):
        ivfpq_topk(catalog.read("raw"), books, queries, nprobe=3)
