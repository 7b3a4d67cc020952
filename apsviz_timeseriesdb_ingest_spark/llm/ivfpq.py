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

Both IVFADC encodings are supported via ``residual=``: the default
quantizes the RAW vector (one global LUT per query); ``residual=True``
quantizes ``v - cell_centroid`` exactly as the paper's IVFADC does.
The textbook motivation is that codebooks then only cover within-cell
spread; whether that wins DEPENDS ON THE DATA — measured on the
synthetic near-random embeddings (tests/test_ivfpq.py), spherical
cells are weak (small centroid norms), the residual distribution
carries MORE per-subspace variance than the raw one, and residual
reconstruction error is ~1.3x WORSE (0.72 vs 0.55 MSE at m=8/16
codes). On corpora with real cluster structure the inequality flips —
that is Jégou et al.'s regime. Hence raw is the default and residual
is an option to A/B on the target corpus, not a blanket upgrade. The
query-side cost of residual is one LUT per (query, probed cell)
instead of per query — still driver-built and tiny (nprobe x m x
codes doubles). Train residual codebooks on :func:`residuals` of the
corpus.

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


def _cent_lit(centroids: list[list[float]]):
    """The k x dim centroid matrix as one array-of-arrays literal."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])


def residuals(vectors: DataFrame, centroids: list[list[float]], *,
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> DataFrame:
    """(id, residual-as-``vec_col``) = v - centroid[cell(v)] — the
    frame residual codebooks are trained on (feed to ``pq.train_pq``).
    One projection: the cell argmin and the subtraction share the row.
    """
    v = (vectors.select(F.col(id_col),
                        F.col(vec_col).cast("array<double>").alias("__vec"))
         .withColumn("__nrm", _norm(F.col("__vec"))))
    cell = _centroid_argmin_expr(centroids, F.col("__vec"), F.col("__nrm"))
    res = F.zip_with(F.col("__vec"),
                     F.element_at(_cent_lit(centroids), cell + 1),
                     lambda a, b: a - b)
    return v.select(F.col(id_col), res.alias(vec_col))


def _argmin_codes(codebooks: list[list[list[float]]], vec,
                  cent=None) -> list:
    """Per-subspace nearest-code expressions; with ``cent`` (the row's
    cell centroid array) the dot terms quantize the RESIDUAL — the
    difference is inlined per component so the whole thing stays one
    arithmetic expression, no intermediate array materialization."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    cols = []
    for s in range(m):
        if cent is None:
            cols.append(_l2_argmin_expr(codebooks[s], _sub(vec, s, sub_dim)))
            continue
        entries = []
        for i, c in enumerate(codebooks[s]):
            dot = None
            for j, x in enumerate(c):
                comp = (F.element_at(vec, s * sub_dim + j + 1)
                        - F.element_at(cent, s * sub_dim + j + 1))
                term = comp * F.lit(float(x))
                dot = term if dot is None else dot + term
            score = (F.lit(2.0) * dot
                     - F.lit(float(sum(x * x for x in c))))
            entries.append(F.struct(
                F.nanvl(score, F.lit(float("-inf"))).alias("s"),
                F.lit(-i).alias("negid")))
        cols.append((-F.array_max(F.array(*entries))["negid"]).cast("int"))
    return cols


def build_ivfpq_index(vectors: DataFrame, centroids: list[list[float]],
                      codebooks: list[list[list[float]]], *,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      cell_col: str = "centroid_id",
                      residual: bool = False,
                      index: "CentroidIndex | CentroidTable | None" = None,
                      partition_groups: int | None = None,
                      group_col: str = "cell_group") -> DataFrame:
    """(id, cell, codes) — the stored index frame, built in ONE
    zero-exchange projection (cell argmin + PQ encode fused; both are
    literal-centroid expressions over the same vector column, so
    Catalyst runs them in a single pass with no join between the
    ``kmeans_assign`` and ``pq_encode`` halves). With ``residual=True``
    the codes quantize ``v - centroid[cell]`` (train the codebooks on
    :func:`residuals` of the same corpus, and probe with the matching
    ``residual=True``).

    ``index=`` (a ``similarity.CentroidIndex`` over the same
    centroids) switches the cell argmin to the two-level table-backed
    assignment for the large-k regime (r6 verdict task 1): the plan
    stays one projection + one broadcast of centroid DATA — no k x dim
    codegen literals — and the residual path binds the row's centroid
    via a broadcast-map lookup instead of the literal matrix. The PQ
    codebooks stay literal either way (m x codes x sub_dim is small
    and fixed — it does not grow with k).

    Write it ``Catalog.overwrite(..., partition_by=(cell_col,))`` and
    the original vectors never need to be co-scanned at query time.

    ``partition_groups`` (r8 verdict task 2 — the bounded-directory
    layout the raw-vector corpus and the embedding stream gained in
    r8, extended to the CODES table): appends ``group_col =
    cell div ceil(k/G)`` via the shared ``similarity.cell_group_col``
    so a ``partition_by=(group_col,)`` write is bounded at G
    directories whatever k is (per-cell ``partition_by`` fans a
    large-k index into k tiny directories — the measured ~sqrt(k)
    small-files regime); probe with the matching
    ``ivfpq_topk(group_col=, groups=)`` to keep BOTH pruning levels
    (literal directory filter on the group + the cell predicate in
    parquet row-group stats, tight because cell ranges are
    contiguous).
    """
    from .similarity import cell_group_col

    def _with_group(out: DataFrame) -> DataFrame:
        if partition_groups is None:
            return out
        return out.withColumn(group_col, cell_group_col(
            F.col(cell_col), len(centroids), partition_groups))

    v = (vectors.select(F.col(id_col),
                        F.col(vec_col).cast("array<double>").alias("__vec"))
         .withColumn("__nrm", _norm(F.col("__vec"))))
    if index is not None:
        from .similarity import with_centroid_cell

        v = with_centroid_cell(v, index, vec_col="__vec", nrm_col="__nrm",
                               out_col="__cell",
                               cent_col="__cent" if residual else None,
                               id_col=id_col)
        codes = F.array(*_argmin_codes(
            codebooks, F.col("__vec"),
            F.col("__cent") if residual else None))
        return _with_group(v.select(F.col(id_col),
                                    F.col("__cell").alias(cell_col),
                                    codes.alias("codes")))
    cell = _centroid_argmin_expr(centroids, F.col("__vec"), F.col("__nrm"))
    if residual:
        # bind the row's centroid once in its own projection so the
        # m x codes x sub_dim difference terms reference a column, not
        # a repeated element_at(literal-matrix, argmin) subtree
        v = v.withColumn("__cell", cell).withColumn(
            "__cent", F.element_at(_cent_lit(centroids), F.col("__cell") + 1))
        codes = F.array(*_argmin_codes(codebooks, F.col("__vec"),
                                       F.col("__cent")))
        return _with_group(v.select(F.col(id_col),
                                    F.col("__cell").alias(cell_col),
                                    codes.alias("codes")))
    codes = F.array(*_argmin_codes(codebooks, F.col("__vec")))
    return _with_group(v.select(F.col(id_col), cell.alias(cell_col),
                                codes.alias("codes")))


def ivfpq_topk(index: DataFrame, codebooks: list[list[list[float]]],
               queries: list[tuple[int, list[float]]],
               centroids: "list[list[float]] | None" = None, *,
               nprobe: int = 2,
               top_k: int = 3, id_col: str = "vec_id",
               cell_col: str = "centroid_id",
               rerank: DataFrame | None = None,
               vec_col: str = "embedding",
               shortlist: int = 50,
               residual: bool = False,
               group_col: str | None = None,
               groups: int | None = None,
               centroid_index=None) -> DataFrame:
    """Top-k per query over the IVFPQ index, reading ONLY nprobe cells.

    Stages: (1) driver-side ``probe_cells_for`` picks each query's
    nprobe cells; the union becomes a literal ``isin`` partition filter
    on the codes-only index scan. (2) ADC: each query ships its
    m x codes lookup table of exact subvector distances; a candidate's
    approximate distance is m ``element_at`` lookups summed — the
    original vectors are not read. With ``residual=True`` (match the
    index build) the LUT is per (query, probed cell): distances between
    the query's residual vs that cell and the residual codebooks —
    nprobe x m x codes doubles per query, still driver-built, carried
    by the same exploded (query, cell) broadcast frame. (3) optional
    exact re-rank: the ADC shortlist (queries x shortlist rows,
    broadcast) fetches true vectors from ``rerank`` and re-orders by
    exact cosine, exactly as ``pq.pq_topk`` does.

    Returns (query_id, neighbor_id, rank), rank 1 = nearest; ADC ties
    break on id, re-rank ties on id.

    ``group_col`` + ``groups``: probe a GROUPED index layout (written
    with ``build_ivfpq_index(partition_groups=G)`` +
    ``partition_by=(group_col,)``): the literal directory filter moves
    to the group ids covering the probed cells and the cell predicate
    drops to parquet row-group stats — identical results, the same two
    pruning levels ``similarity.ivf_probe`` gained in r8.

    ``index`` may be a ``(catalog, table)`` tuple (r10): the codes
    table is opened through its ``{table}_layout`` sidecar
    (:func:`similarity.read_ann_layout`) and the geometry is derived
    from the pin — caller-supplied ``groups``/``group_col`` must match
    it or the probe raises, same contract as ``ivf_probe``.

    ``centroid_index=`` (a :class:`similarity.CentroidIndex` /
    :class:`similarity.CentroidTable`) replaces the driver-held
    ``centroids`` list (r10): the query batch probes the index
    (bounded ≤|batch|·nprobe collect) and, for ``residual=True``, the
    probed cells' centroid vectors come from the index's own state —
    a bounded filtered collect on the table rung, so residual ADC
    works at table-resident k too.
    """
    from .similarity import (_centroid_vec_lookup, _open_pinned_layout,
                             _probe_cells_via_index, cell_groups_for)

    if centroid_index is not None:
        k_cent = int(centroid_index.k)
    elif centroids is not None:
        k_cent = len(centroids)
    else:
        raise ValueError("ivfpq_topk needs centroids= (driver list) or "
                         "centroid_index= (CentroidIndex/CentroidTable)")
    if isinstance(index, tuple):
        index, groups, group_col = _open_pinned_layout(
            index, k_cent, groups, group_col)
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    spark = index.sparkSession
    if centroid_index is not None:
        cells = _probe_cells_via_index(spark, centroid_index, queries,
                                       nprobe)
    else:
        cells = probe_cells_for(queries, centroids, nprobe=nprobe)
    all_cells = sorted({c for cs in cells.values() for c in cs})
    if group_col is not None:
        if not groups:
            raise ValueError("group_col requires groups= (the G the "
                             "layout was written with)")
        if group_col not in index.columns:
            raise ValueError(
                f"grouped probe: index has no '{group_col}' column — "
                f"this table was written per-cell, not with "
                f"build_ivfpq_index(partition_groups=G); probe without "
                f"group_col=, or rebuild the layout")
        index = index.filter(F.col(group_col).isin(
            cell_groups_for(all_cells, k_cent, groups)))

    def lut_for(q: list[float], cent: list[float] | None) -> list[list[float]]:
        r = q if cent is None else [a - b for a, b in zip(q, cent)]
        return [[sum((r[s * sub_dim + j] - c[j]) ** 2
                     for j in range(sub_dim))
                 for c in codebooks[s]] for s in range(m)]

    cvec = (_centroid_vec_lookup(spark, centroid_index, centroids,
                                 all_cells)
            if residual else None)
    qrows = []
    crows = []
    for qid, q in queries:
        q = [float(x) for x in q]
        qrows.append((qid, q))
        for cid in cells[qid]:
            crows.append((qid, cid,
                          lut_for(q, cvec(cid) if residual else None)))
    qdf = spark.createDataFrame(qrows, "query_id long, qvec array<double>")
    qcells = spark.createDataFrame(
        crows, f"query_id long, {cell_col} int, lut array<array<double>>")
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
