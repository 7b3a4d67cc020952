"""Reliable-checkpoint seam for iterative operators (r3 verdict task 2):
the catalog-table lineage cut produces IDENTICAL results to the
localCheckpoint path, writes the promised durable tables, and honors the
every-k cadence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.operators.itercheckpoint import (
    LineageCutter,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog


def _edges(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(40)] + \
        [("hub", f"n{i}") for i in range(0, 23, 2)]
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cutter_slots_alternate_and_every(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cut = LineageCutter(cat, prefix="it", every=2)
    df = spark.range(5)
    cut(df, "s")          # count 0 -> table slot 0
    cut(df, "s")          # count 1 -> localCheckpoint (no new table)
    cut(df, "s")          # count 2 -> table slot 1
    cut(df, "s")          # count 3 -> local
    cut(df, "s")          # count 4 -> table slot 0 again (overwrite)
    assert cat.exists("it_s_0") and cat.exists("it_s_1")
    assert not cat.exists("it_s_2")
    # distinct state names get distinct tables
    cut(df, "other")
    assert cat.exists("it_other_0")
    with pytest.raises(ValueError):
        LineageCutter(cat, every=0)


def test_pagerank_catalog_checkpoint_identical(spark, tmp_path):
    from apsviz_timeseriesdb_ingest_spark.llm.graph import pagerank

    edges = _edges(spark)
    base = {r.node: r.rank for r in pagerank(edges, iters=8).collect()}
    cat = Catalog(spark, str(tmp_path / "wh"))
    via_tables = {r.node: r.rank
                  for r in pagerank(edges, iters=8,
                                    checkpoint_catalog=cat,
                                    checkpoint_every=3).collect()}
    # decimal-summed update => bit-identical, not merely close
    assert base == via_tables
    # the durable state tables exist on shared storage
    for t in ("pagerank_edges_0", "pagerank_nodes_0",
              "pagerank_outdeg_0", "pagerank_ranks_0",
              "pagerank_ranks_1"):
        assert cat.exists(t), t
    assert os.listdir(cat.path("pagerank_ranks_0"))


def test_neardup_clusters_catalog_checkpoint_identical(spark, tmp_path):
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import neardup_clusters

    # two components + a chain (exercises several CC rounds)
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12),
             (20, 21), (5, 4), (6, 5), (7, 6)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    base = {(r.doc_id, r.cluster_id)
            for r in neardup_clusters(df).collect()}
    cat = Catalog(spark, str(tmp_path / "wh"))
    for algo in ("star", "label"):
        got = {(r.doc_id, r.cluster_id)
               for r in neardup_clusters(df, algorithm=algo,
                                         checkpoint_catalog=cat,
                                         checkpoint_prefix=f"cc_{algo}")
               .collect()}
        assert got == base, algo
        assert cat.exists(f"cc_{algo}_edges_0")
    assert cat.exists("cc_star_work_0")
    assert cat.exists("cc_label_labels_0")


def test_cross_corpus_neardup_catalog_checkpoint_identical(spark, tmp_path):
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import (
        cross_corpus_neardup,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different sentence about spark catalysts"),
         (3, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    base = {(r.doc_id, r.neardup_of_reference, r.best_jaccard)
            for r in cross_corpus_neardup(corpus, ref).collect()}
    cat = Catalog(spark, str(tmp_path / "wh"))
    got = {(r.doc_id, r.neardup_of_reference, r.best_jaccard)
           for r in cross_corpus_neardup(
               corpus, ref, checkpoint_catalog=cat).collect()}
    assert got == base
    assert cat.exists("xcorpus_cand_0")
