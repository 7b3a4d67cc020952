"""Plan-quality regression guards: the optimizations we rely on at scale
must stay visible in the physical plan (pushdown, broadcast, no
sort-merge joins where dims should broadcast)."""

from __future__ import annotations

import contextlib
import io

import pytest

from apsviz_timeseriesdb_ingest_spark import suite

QUERIES = {**suite.all_queries(), **suite.displaced_queries()}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_p1_filters_pushed(spark, sf_small):
    plan = _plan(QUERIES["p1_equality_filter"](spark, sf_small))
    assert "PushedFilters" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThan" in plan  # shipdate bound reaches the scan


def test_q5_all_dims_broadcast(spark, sf_small):
    # at gate scale every hint engages (constant dims unconditionally,
    # customer/supplier via the size condition) — zero sort-merge
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never sort-merge


def test_q5_fact_scaling_hints_are_size_conditional(spark, sf_small):
    """r8 verdict soft note #2: customer/supplier scale linearly with
    SF, so their broadcast hints must be size-conditional — with the
    threshold forced to 0 bytes the hint is dropped (AQE decides),
    while the genuinely constant-size nation/region stay hinted."""
    from apsviz_timeseriesdb_ingest_spark.suite.relational import (
        _bcast_if_small, tables)

    c = tables(spark, sf_small, "customer")
    hinted = _bcast_if_small(c, sf_small, "customer")
    unhinted = _bcast_if_small(c, sf_small, "customer", max_bytes=0)
    assert "ResolvedHint" in hinted._jdf.queryExecution() \
        .analyzed().toString()
    assert "ResolvedHint" not in unhinted._jdf.queryExecution() \
        .analyzed().toString()
    # a path that is not a real table falls back to UNhinted — never a
    # scale-unsafe default
    assert "ResolvedHint" not in _bcast_if_small(
        c, sf_small, "no_such_table")._jdf.queryExecution() \
        .analyzed().toString()


def test_q1_partial_aggregation(spark, sf_small):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_small))
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_pivot_no_distinct_prejob(spark, sf_small):
    # explicit pivot values -> a single agg pipeline, no extra collect job
    df = QUERIES["x1_event_pivot"](spark, sf_small)
    assert len(df.columns) == 6  # day + 5 fixed categories, schema constant-folded


@pytest.mark.parametrize("name", ["j1_dim_broadcast_join", "j4_anti_join", "j8_semi_join"])
def test_join_queries_use_broadcast(name, spark, sf_small):
    plan = _plan(QUERIES[name](spark, sf_small))
    assert "Broadcast" in plan


def test_simhash_neardup_no_quadratic_join(spark, sf_small):
    # pigeonhole block banding: candidates come from a (block_idx,
    # block_val) equi-join — the r1 O(n^2) theta-join must stay gone
    plan = _plan(QUERIES["llm_simhash_neardup"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_neardup_block_selectivity(spark, sf_small):
    # scale guard (r2 verdict): every pigeonhole block must be >= 12
    # bits wide, i.e. every `shiftright(sig, lo) % 2^width` modulus in
    # the plan is >= 4096 — the 32-bit registration had 6-7-bit blocks
    # (moduli 64/128), whose buckets go hot at corpus scale
    import re

    plan = _plan(QUERIES["llm_simhash_neardup"](spark, sf_small))
    moduli = [int(m) for m in re.findall(r"% (\d+)\)", plan)]
    assert moduli, "expected block moduli in the plan"
    assert min(moduli) >= 4096, f"block modulus too small: {sorted(set(moduli))}"


def test_embedding_neardup_bucketed_no_driver_collect(spark, sf_small):
    # LSH-bucketed path: equi-join on the hyperplane bucket, all
    # JVM-side expressions — no toPandas() collect (ExistingRDD) and no
    # Python/Arrow stage in the plan
    plan = _plan(QUERIES["llm_embedding_neardup"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" not in plan
    assert "python" not in plan.lower()


@pytest.mark.parametrize("name", ["llm_pack_documents"])
def test_shuffle_order_no_single_task_sort(name, spark, sf_small):
    # the bucketed two-phase enumeration must never funnel the corpus
    # through one task (the r1 global Window.orderBy shape)
    plan = _plan(QUERIES[name](spark, sf_small))
    assert "SinglePartition" not in plan


def test_x2_constant_schema(spark, sf_small):
    df = QUERIES["x2_allparms_pivot"](spark, sf_small)
    assert len(df.columns) == 6  # time_stamp + 5 explicit categories


def test_pq_search_stays_jvm_side(spark, sf_small):
    # the ADC scan + shortlist re-rank must be pure expressions over
    # broadcast frames: no Python/Arrow stage, no row collect into the
    # plan (ADC's query cross join is broadcast by construction)
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.pq import (
        pq_encode, pq_topk, train_pq)
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    books = train_pq(vecs, dim=64, m=8, codes=16, iters=0)
    queries = [(r.vec_id, list(r.embedding))
               for r in vecs.filter(F.col("vec_id") < 2).collect()]
    plan = _plan(pq_topk(pq_encode(vecs, books), books, queries,
                         rerank=vecs, shortlist=10))
    # the driver-built query frame legitimately shows as
    # applySchemaToPythonRDD (a LocalTableScan source, rows already on
    # the driver) — what must NOT appear is per-row Python execution
    for stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                  "FlatMapGroupsInPandas"):
        assert stage not in plan
    assert "Broadcast" in plan


def test_bm25_broadcast_queries_partial_agg(spark, sf_small):
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import bm25_topk
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    docs = load_table(spark, sf_small, "documents")
    queries = spark.createDataFrame([(0, "the cat sat")],
                                    "query_id long, text string")
    plan = _plan(bm25_topk(docs, queries, n_docs=100, avgdl=50.0))
    assert "BroadcastHashJoin" in plan          # query terms broadcast
    assert "BroadcastNestedLoop" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_paragraph_dedup_partial_agg_no_bnlj(spark, sf_small):
    from apsviz_timeseriesdb_ingest_spark.llm.spans import dedup_paragraphs
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    docs = load_table(spark, sf_small, "documents")
    plan = _plan(dedup_paragraphs(docs))
    assert "BroadcastNestedLoop" not in plan
    # the paragraph-key stats aggregate must be map-side partial
    assert "partial_min" in plan or "partial_count" in plan


def test_gopher_signals_zero_exchange(spark, sf_small):
    """The gated per-doc signal suite (gopher + bucket + split +
    mixture) must stay ONE map-side projection: no Exchange, no Python
    execution, filters absent — scan → project only."""
    plan = _plan(QUERIES["llm_gopher_stats"](spark, sf_small))
    assert "Exchange" not in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan


def test_chunk_documents_single_expansion(spark, sf_small):
    """Chunking = repartition + one Generate; no aggregate, no join,
    no Python."""
    plan = _plan(QUERIES["llm_chunk_documents"](spark, sf_small))
    # formatted plans list each node twice (tree + detail section)
    assert plan.count("Generate") == 2
    assert "Join" not in plan and "Aggregate" not in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan


def test_asof_join_single_window_no_range_join(spark, sf_small):
    # union + carry-forward window: ONE hash partitioning on the key,
    # no quadratic range join anywhere in the plan
    plan = _plan(QUERIES["j10_asof_join"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # it is not a join at all
    assert plan.count("Window") >= 1
    assert "Union" in plan


def test_overlap_join_bucketed_equi_join(spark, sf_small):
    # bucket expansion makes the interval overlap an EQUI-join: the
    # exact predicate is a residual filter, never a nested-loop join
    plan = _plan(QUERIES["p5_overlap_join"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the interval -> bucket explode


def test_kmeans_assign_zero_exchange(spark, sf_small):
    # literal-centroid argmin is a pure projection over the scan
    plan = _plan(QUERIES["llm_kmeans_assign"](spark, sf_small))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pagerank_pass_broadcast_base_no_driver_collect(spark):
    # one iteration = one job: the dangling/teleport base joins as a
    # BROADCAST one-row frame, and the only shuffles are the
    # edges-ranks join + the dst aggregate
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.graph import _pagerank_pass
    from apsviz_timeseriesdb_ingest_spark.operators.itercheckpoint import (
        LineageCutter,
    )

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3 + 1) % 7}") for i in range(12)],
        "src string, dst string")
    es = edges.distinct().withColumn("w", F.lit(1.0))
    nodes = (es.select(F.col("src").alias("node"))
             .unionByName(es.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = (es.groupBy("src").agg(F.sum("w").alias("out"))
              .withColumnRenamed("src", "node"))
    # r12 state shape: (node, rank, out) with out-degree folded in
    ranks = (nodes.join(outdeg, "node", "left")
             .withColumn("rank", F.lit(1.0 / 7))
             .select("node", "rank", "out"))
    out = _pagerank_pass(es, ranks, 0.85, lambda df, name=None: df)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan  # the one-row base broadcasts
    assert "CartesianProduct" not in plan
