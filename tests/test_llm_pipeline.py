"""End-to-end corpus-preparation pipeline: every drop reason exercised
on a hand-built corpus, attrition accounting, determinism, and the
one-map-stage signals claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
    attrition_report,
    corpus_signals,
    prepare_training_corpus,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

EN = ("the cat sat on the mat and the dog is a friend of the cat "
      "and they walk to the park every day to see the ducks swim")


def _docs(spark):
    rows = [
        # kept: clean English prose
        (1, EN),
        (2, "a quick brown fox jumps over the lazy dog and the fox is "
            "happy to run in the field all day with the other animals"),
        # too_short after cleaning (URL stripped away)
        (3, "see https://example.com/a/b/c"),
        # repetitive: one token repeated
        (4, "spam " * 40),
        # language: French markers dominate
        (5, "le chat est dans le jardin et les oiseaux sont dans une "
            "cage et le chien est dans la maison dans une boite"),
        # exact_dup of doc 1 (same cleaned text)
        (6, EN),
        # near_dup of doc 1: one trailing word appended (high shingle
        # Jaccard; verified to collide under the default LSH family —
        # a mid-text word swap at this length happens not to)
        (7, EN + " okay"),
        # contaminated: shares shingles with the benchmark doc
        (8, "the benchmark question asks what is the capital of france "
            "and the answer to the benchmark question is paris of course"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of france and the answer is paris")],
        "doc_id long, text string")


def test_pipeline_drop_reasons(spark):
    corpus, audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark),
        min_tokens=10, max_repetition_ratio=0.5, languages=("en",))
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons == {
        1: None, 2: None,
        3: "too_short",
        4: "repetitive",
        5: "language",
        6: "exact_dup",
        7: "near_dup",
        8: "contaminated",
    }
    kept = {r.doc_id for r in corpus.collect()}
    assert kept == {1, 2}


def test_pipeline_corpus_columns_and_split(spark):
    corpus, _ = prepare_training_corpus(
        _docs(spark), None, min_tokens=10, max_repetition_ratio=0.5)
    rows = corpus.collect()
    assert set(corpus.columns) == {"doc_id", "text", "n_tokens",
                                   "predicted_lang", "split_bucket", "split"}
    for r in rows:
        assert r.split in ("train", "eval")
        assert (r.split == "train") == (r.split_bucket < 95)
        # text is the cleaned+scrubbed form: no URLs / emails survive
        assert "http" not in r.text and "@" not in r.text


def test_pipeline_no_benchmark_skips_contamination(spark):
    _, audit = prepare_training_corpus(
        _docs(spark), None, min_tokens=10, max_repetition_ratio=0.5)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons[8] is None  # doc 8 survives without a benchmark


def test_attrition_report_accounts_for_every_doc(spark):
    _, audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark),
        min_tokens=10, max_repetition_ratio=0.5)
    rep = {r.stage: (r.n_docs, r.fraction) for r in
           attrition_report(audit).collect()}
    assert sum(n for n, _ in rep.values()) == 8
    assert rep["kept"][0] == 2
    assert abs(sum(f for _, f in rep.values()) - 1.0) < 1e-6


def test_pipeline_deterministic(spark):
    a_corpus, a_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    b_corpus, b_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    assert sorted(map(tuple, a_corpus.collect())) == \
        sorted(map(tuple, b_corpus.collect()))
    assert sorted(map(tuple, a_audit.collect())) == \
        sorted(map(tuple, b_audit.collect()))


def test_pipeline_runs_on_documents_table(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    corpus, audit = prepare_training_corpus(train, bench, fast=True)
    n_in = train.count()
    assert audit.count() == n_in
    n_kept = corpus.count()
    assert 0 < n_kept <= n_in
    # audit NULL-reason count == corpus count (tag-don't-filter invariant)
    assert audit.filter(F.col("drop_reason").isNull()).count() == n_kept


def test_pipeline_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus, audit = prepare_training_corpus(empty, None)
    assert corpus.count() == 0 and audit.count() == 0
    assert attrition_report(audit).count() == 0
    # empty benchmark frame: nothing is contaminated, pipeline still runs
    docs = _docs(spark)
    c2, a2 = prepare_training_corpus(docs, empty, min_tokens=10,
                                     max_repetition_ratio=0.5)
    reasons = {r.doc_id: r.drop_reason for r in a2.collect()}
    assert reasons[8] is None


def test_corpus_signals_single_map_stage(spark):
    """The per-row signal pass must not shuffle: no exchange in the plan."""
    plan = corpus_signals(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pipeline_checkpoint_tables_match_cached(spark, tmp_path):
    """catalog= switches reused intermediates from executor cache to
    checkpoint tables (the 100 TB form) with identical results."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    a_corpus, a_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    b_corpus, b_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5, cache=False, catalog=cat)
    assert sorted(map(tuple, a_corpus.collect())) == \
        sorted(map(tuple, b_corpus.collect()))
    assert sorted(map(tuple, a_audit.collect())) == \
        sorted(map(tuple, b_audit.collect()))
    # the intermediates are real tables, inspectable after the run
    for t in ["corpus_prep_tagged", "corpus_prep_exact_losers",
              "corpus_prep_near_losers", "corpus_prep_contaminated"]:
        assert cat.exists(t)
