"""IVF+PQ: the composed ANN index — IVF cells for partition pruning,
PQ codes for scan-size compression and lookup-table scoring (Jégou,
Douze, Schmid, "Product quantization for nearest neighbor search",
TPAMI 2011, §IV "IVFADC" — public paper; FAISS's default large-scale
index, re-expressed relationally).

Why the composition matters at 100 TB: IVF alone (``similarity.
ivf_probe``) prunes the scan to nprobe/k of the files but still reads
full vectors in the probed cells; PQ alone (``pq.pq_topk``) shrinks
every row to m small ints but still scans the whole corpus. Composed,
the search reads nprobe/k of an index that is itself ~32x smaller than
the raw vectors, scores each candidate with m ``element_at`` lookups,
and touches original vectors only for the per-query shortlist
(queries x shortlist rows — constant in corpus size) during exact
re-rank.

Variant note (honest difference from IVFADC): codes here quantize the
RAW vector, not the residual (v - cell centroid). Residual encoding
recovers some accuracy at equal code size but needs per-cell LUTs at
query time; the relational plumbing is identical, so this module keeps
the simpler raw-vector form and leans on the exact re-rank stage for
accuracy (measured in ``tests/test_ivfpq.py``, not assumed).

Everything stays JVM-side: index build is ONE zero-exchange projection
(cell argmin + m code argmins, all literal-centroid codegen), the
probe is a literal ``isin`` partition filter (guaranteed pruning — no
reliance on dynamic partition pruning), and ADC scoring is pure
``element_at`` arithmetic. No Python rows, no HOF folds in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pq import _l2_argmin_expr, _sub
from .similarity import _centroid_argmin_expr, _norm, probe_cells_for


def build_ivfpq_index(vectors: DataFrame, centroids: list[list[float]],
                      codebooks: list[list[list[float]]], *,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      cell_col: str = "centroid_id") -> DataFrame:
    """(id, cell, codes) — the stored index frame, built in ONE
    zero-exchange projection (cell argmin + PQ encode fused; both are
    literal-centroid expressions over the same vector column, so
    Catalyst runs them in a single pass with no join between the
    ``kmeans_assign`` and ``pq_encode`` halves).

    Write it ``Catalog.overwrite(..., partition_by=(cell_col,))`` and
    the original vectors never need to be co-scanned at query time.
    """
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    v = (vectors.select(F.col(id_col),
                        F.col(vec_col).cast("array<double>").alias("__vec"))
         .withColumn("__nrm", _norm(F.col("__vec"))))
    cell = _centroid_argmin_expr(centroids, F.col("__vec"), F.col("__nrm"))
    codes = F.array(*[
        _l2_argmin_expr(codebooks[s], _sub(F.col("__vec"), s, sub_dim))
        for s in range(m)])
    return v.select(F.col(id_col), cell.alias(cell_col),
                    codes.alias("codes"))


def ivfpq_topk(index: DataFrame, codebooks: list[list[list[float]]],
               queries: list[tuple[int, list[float]]],
               centroids: list[list[float]], *, nprobe: int = 2,
               top_k: int = 3, id_col: str = "vec_id",
               cell_col: str = "centroid_id",
               rerank: DataFrame | None = None,
               vec_col: str = "embedding",
               shortlist: int = 50) -> DataFrame:
    """Top-k per query over the IVFPQ index, reading ONLY nprobe cells.

    Stages: (1) driver-side ``probe_cells_for`` picks each query's
    nprobe cells; the union becomes a literal ``isin`` partition filter
    on the codes-only index scan. (2) ADC: each query ships its
    m x codes lookup table of exact subvector distances; a candidate's
    approximate distance is m ``element_at`` lookups summed — the
    original vectors are not read. (3) optional exact re-rank: the ADC
    shortlist (queries x shortlist rows, broadcast) fetches true
    vectors from ``rerank`` and re-orders by exact cosine, exactly as
    ``pq.pq_topk`` does.

    Returns (query_id, neighbor_id, rank), rank 1 = nearest; ADC ties
    break on id, re-rank ties on id.
    """
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    spark = index.sparkSession
    cells = probe_cells_for(queries, centroids, nprobe=nprobe)
    all_cells = sorted({c for cs in cells.values() for c in cs})
    rows = []
    for qid, q in queries:
        q = [float(x) for x in q]
        lut = [[sum((q[s * sub_dim + j] - c[j]) ** 2 for j in range(sub_dim))
                for c in codebooks[s]] for s in range(m)]
        rows.append((qid, cells[qid], lut, q))
    qdf = spark.createDataFrame(
        rows, "query_id long, cells array<int>, "
              "lut array<array<double>>, qvec array<double>")
    qcells = qdf.select("query_id", "lut",
                        F.explode("cells").alias(cell_col))
    dist = None
    for s in range(m):
        term = F.element_at(F.element_at(F.col("lut"), s + 1),
                            F.element_at(F.col("codes"), s + 1) + 1)
        dist = term if dist is None else dist + term
    w = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col(id_col))
    keep = top_k if rerank is None else max(top_k, shortlist)
    adc = (index.filter(F.col(cell_col).isin(all_cells))
           .join(F.broadcast(qcells), cell_col)
           .filter(F.col(id_col) != F.col("query_id"))
           .withColumn("adist", dist)
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= keep)
           .select("query_id", F.col(id_col).alias("neighbor_id"), "rank"))
    if rerank is None:
        return adc
    vecs = rerank.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).cast("array<double>").alias("nvec"))
    scored = (vecs.join(F.broadcast(adc.drop("rank")), "neighbor_id")
              .join(F.broadcast(qdf.select("query_id", "qvec")), "query_id"))
    sim = (F.aggregate(F.zip_with(F.col("qvec"), F.col("nvec"),
                                  lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)
           / (F.sqrt(F.aggregate(F.transform(F.col("qvec"), lambda x: x * x),
                                 F.lit(0.0), lambda a, x: a + x))
              * F.sqrt(F.aggregate(F.transform(F.col("nvec"),
                                               lambda x: x * x),
                                   F.lit(0.0), lambda a, x: a + x))))
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("neighbor_id"))
    return (scored.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "neighbor_id", "rank"))
