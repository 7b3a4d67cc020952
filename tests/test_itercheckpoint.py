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


def test_bpe_unigram_catalog_checkpoint_identical(spark, tmp_path):
    """The tokenizer trainings (the other long-iteration operators the
    r3 verdict flagged) produce identical models through the durable
    table path."""
    from apsviz_timeseriesdb_ingest_spark.llm.bpe import (
        bpe_encode_docs,
        train_bpe,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.unigram import train_unigram

    docs = spark.createDataFrame(
        [(i, "the bright lighthouse lights the nightly coastline "
             "while weather stations watch the rising water")
         for i in range(6)] +
        [(10, "shuffle partitions shuffle again nightly"),
         (11, "coastline weather rising rising rising water")],
        "doc_id long, text string")
    cat = Catalog(spark, str(tmp_path / "wh"))

    base = train_bpe(docs, num_merges=12, batch=4)
    via = train_bpe(docs, num_merges=12, batch=4, checkpoint_catalog=cat,
                    checkpoint_every=2)
    assert base.merges == via.merges
    assert cat.exists("bpe_words_0")
    enc_a = {r.doc_id: r.bpe_tokens
             for r in bpe_encode_docs(docs, base, engine="sql").collect()}
    enc_b = {r.doc_id: r.bpe_tokens
             for r in bpe_encode_docs(docs, base, engine="sql",
                                      checkpoint_catalog=cat).collect()}
    assert enc_a == enc_b

    u_base = train_unigram(docs, vocab_size=48, seed_size=96, em_iters=1)
    u_via = train_unigram(docs, vocab_size=48, seed_size=96, em_iters=1,
                          checkpoint_catalog=cat)
    assert u_base.pieces == u_via.pieces
    assert u_base.log_probs == u_via.log_probs
    assert cat.exists("unigram_words_0")


def test_pagerank_resume_from_progress_table(spark, tmp_path):
    """Driver-loss recovery: a run killed after iteration k resumes
    from the {prefix}_progress row + slot tables and finishes
    bit-identical to an uninterrupted run."""
    from apsviz_timeseriesdb_ingest_spark.llm.graph import pagerank

    edges = _edges(spark)
    full = {r.node: r.rank for r in pagerank(edges, iters=9).collect()}

    cat = Catalog(spark, str(tmp_path / "wh"))
    # "crashed" run: completed only 4 of 9 iterations before dying
    pagerank(edges, iters=4, checkpoint_catalog=cat).collect()
    prog = cat.read("pagerank_progress").collect()[0]
    assert prog["iter"] == 4 and prog["table"].startswith("pagerank_ranks_")

    resumed = {r.node: r.rank
               for r in pagerank(edges, iters=9, checkpoint_catalog=cat,
                                 resume=True).collect()}
    assert resumed == full
    assert cat.read("pagerank_progress").collect()[0]["iter"] == 9

    # resume with nothing left to do returns the stored state unchanged
    again = {r.node: r.rank
             for r in pagerank(edges, iters=9, checkpoint_catalog=cat,
                               resume=True).collect()}
    assert again == full

    # resume without a progress table just runs fresh
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    fresh = {r.node: r.rank
             for r in pagerank(edges, iters=9, checkpoint_catalog=cat2,
                               resume=True).collect()}
    assert fresh == full

    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires checkpoint_catalog"):
        pagerank(edges, iters=2, resume=True)


def test_pagerank_resume_respects_every_k(spark, tmp_path):
    """With checkpoint_every=3, progress tracks only durable writes;
    resuming replays the missing rounds and still matches exactly."""
    from apsviz_timeseriesdb_ingest_spark.llm.graph import pagerank

    edges = _edges(spark)
    full = {r.node: r.rank for r in pagerank(edges, iters=8).collect()}
    cat = Catalog(spark, str(tmp_path / "wh"))
    pagerank(edges, iters=5, checkpoint_catalog=cat,
             checkpoint_every=3).collect()
    # durable writes happened at iterations 1 and 4 only
    assert cat.read("pagerank_progress").collect()[0]["iter"] == 4
    resumed = {r.node: r.rank
               for r in pagerank(edges, iters=8, checkpoint_catalog=cat,
                                 checkpoint_every=3,
                                 resume=True).collect()}
    assert resumed == full


def test_pagerank_resume_rejects_shorter_iters(spark, tmp_path):
    from apsviz_timeseriesdb_ingest_spark.llm.graph import pagerank

    cat = Catalog(spark, str(tmp_path / "wh"))
    edges = _edges(spark)
    pagerank(edges, iters=5, checkpoint_catalog=cat).collect()
    with pytest.raises(ValueError, match="further along"):
        pagerank(edges, iters=3, checkpoint_catalog=cat, resume=True)


def test_bpe_resume_from_progress_table(spark, tmp_path):
    """Driver-loss recovery for BPE training (r4 verdict task 4): a run
    killed after k merges resumes from the {prefix}_progress merge list
    + words slot table and finishes merge-for-merge identical to an
    uninterrupted run."""
    from apsviz_timeseriesdb_ingest_spark.llm.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, "the bright lighthouse lights the nightly coastline "
             "while weather stations watch the rising water")
         for i in range(6)] +
        [(10, "shuffle partitions shuffle again nightly"),
         (11, "coastline weather rising rising rising water")],
        "doc_id long, text string")

    full = train_bpe(docs, num_merges=12, batch=1)

    cat = Catalog(spark, str(tmp_path / "wh"))
    # "crashed" run: completed only 5 of 12 merges before dying
    train_bpe(docs, num_merges=5, batch=1, checkpoint_catalog=cat)
    prog = cat.read("bpe_progress").orderBy("idx").collect()
    assert len(prog) == 5
    assert prog[0]["table"].startswith("bpe_words_")

    resumed = train_bpe(docs, num_merges=12, batch=1,
                        checkpoint_catalog=cat, resume=True)
    assert resumed.merges == full.merges
    assert resumed.eow == full.eow
    assert len(cat.read("bpe_progress").collect()) == 12

    # resume with nothing left to do returns the stored merges unchanged
    again = train_bpe(docs, num_merges=12, batch=1,
                      checkpoint_catalog=cat, resume=True)
    assert again.merges == full.merges

    # stored progress beyond the request is an error, like pagerank
    with pytest.raises(ValueError, match="further along"):
        train_bpe(docs, num_merges=3, batch=1,
                  checkpoint_catalog=cat, resume=True)
    with pytest.raises(ValueError, match="requires checkpoint_catalog"):
        train_bpe(docs, num_merges=3, resume=True)

    # resume without a progress table runs fresh
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    fresh = train_bpe(docs, num_merges=12, batch=1,
                      checkpoint_catalog=cat2, resume=True)
    assert fresh.merges == full.merges


def test_unigram_resume_after_injected_driver_loss(spark, tmp_path,
                                                   monkeypatch):
    """Driver-loss recovery for unigram-LM training: kill the run
    mid-EM (injected exception), then resume from the persisted
    {prefix}_model + words tables — piece-for-piece and
    log-prob-for-log-prob identical to an uninterrupted run."""
    import apsviz_timeseriesdb_ingest_spark.llm.unigram as ug

    docs = spark.createDataFrame(
        [(i, "the bright lighthouse lights the nightly coastline "
             "while weather stations watch the rising water")
         for i in range(6)] +
        [(10, "shuffle partitions shuffle again nightly"),
         (11, "coastline weather rising rising rising water")],
        "doc_id long, text string")
    kw = dict(vocab_size=48, seed_size=96, em_iters=1)

    full = ug.train_unigram(docs, **kw)

    cat = Catalog(spark, str(tmp_path / "wh"))
    real = ug._expected_counts
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected driver loss")
        return real(*a, **k)

    monkeypatch.setattr(ug, "_expected_counts", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        ug.train_unigram(docs, **kw, checkpoint_catalog=cat)
    monkeypatch.undo()
    assert cat.exists("unigram_model")

    resumed = ug.train_unigram(docs, **kw, checkpoint_catalog=cat,
                               resume=True)
    assert resumed.pieces == full.pieces
    assert resumed.log_probs == full.log_probs

    with pytest.raises(ValueError, match="requires checkpoint_catalog"):
        ug.train_unigram(docs, **kw, resume=True)

    # resume without a model table runs fresh
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    fresh = ug.train_unigram(docs, **kw, checkpoint_catalog=cat2,
                             resume=True)
    assert fresh.pieces == full.pieces
    assert fresh.log_probs == full.log_probs


@pytest.mark.parametrize("algorithm", ["star", "label"])
def test_neardup_clusters_resume(spark, tmp_path, algorithm):
    """Driver-loss recovery for near-dup connected components: a run
    that dies mid-rounds (simulated by a too-small max_iters budget,
    which raises AFTER recording durable progress) resumes from the
    {prefix}_progress row + state slot table and produces the identical
    clustering."""
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import neardup_clusters

    # a 33-node path graph: label propagation needs ~diameter rounds,
    # star needs ~log2(n) — both need > 2
    pairs = spark.createDataFrame([(i, i + 1) for i in range(33)],
                                  "doc_a long, doc_b long")
    full = {r.doc_id: r.cluster_id
            for r in neardup_clusters(pairs, algorithm=algorithm,
                                      max_iters=40).collect()}
    assert set(full.values()) == {0}

    cat = Catalog(spark, str(tmp_path / "wh"))
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(pairs, algorithm=algorithm, max_iters=2,
                         checkpoint_catalog=cat)
    prog = cat.read("neardup_cc_progress").collect()[0]
    assert prog["round"] == 2

    resumed = {r.doc_id: r.cluster_id
               for r in neardup_clusters(pairs, algorithm=algorithm,
                                         max_iters=40,
                                         checkpoint_catalog=cat,
                                         resume=True).collect()}
    assert resumed == full

    # resume with a satisfied budget re-verifies convergence and
    # returns the same clustering
    again = {r.doc_id: r.cluster_id
             for r in neardup_clusters(pairs, algorithm=algorithm,
                                       max_iters=40,
                                       checkpoint_catalog=cat,
                                       resume=True).collect()}
    assert again == full

    with pytest.raises(ValueError, match="requires checkpoint_catalog"):
        neardup_clusters(pairs, algorithm=algorithm, resume=True)
