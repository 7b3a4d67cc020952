"""Mergeable HLL corpus sketches: lossless merge (split == whole,
exactly), accuracy vs exact distincts, duplicate-rate proxy, grouped
form, and the incremental catalog-append monitoring flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.sketches import (
    corpus_sketch,
    merge_corpus_sketches,
    sketch_estimates,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table


def test_merge_is_lossless_and_accurate(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    whole = sketch_estimates(corpus_sketch(docs)).collect()[0]

    # split by parity, sketch each half, merge the rows
    halves = [corpus_sketch(docs.filter(F.col("doc_id") % 2 == i))
              for i in (0, 1)]
    merged = sketch_estimates(merge_corpus_sketches(
        halves[0].unionByName(halves[1]))).collect()[0]
    # HLL union at equal lg_k is register-wise max: EXACTLY the sketch
    # of the concatenated corpus
    assert merged.vocab_estimate == whole.vocab_estimate
    assert merged.distinct_content_estimate == \
        whole.distinct_content_estimate
    assert merged.n_docs == whole.n_docs == docs.count()
    assert merged.n_tokens == whole.n_tokens

    # accuracy: ~0.8% RSE at lg_k=14 — assert 5%
    exact_vocab = (docs.select(F.explode(F.split(F.lower("text"),
                                                 r"\s+")).alias("t"))
                   .filter(F.col("t") != "").distinct().count())
    assert abs(whole.vocab_estimate - exact_vocab) <= \
        max(2, 0.05 * exact_vocab)
    exact_content = docs.select(F.md5("text")).distinct().count()
    assert abs(whole.distinct_content_estimate - exact_content) <= \
        max(2, 0.05 * exact_content)
    assert whole.est_duplicate_docs == max(
        0, whole.n_docs - whole.distinct_content_estimate)


def test_duplicate_rate_proxy_and_groups(spark):
    rows = [(i, "totally duplicated text body", "a") for i in range(40)]
    rows += [(100 + i, f"unique document number {i}", "b")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    by_src = {r.source: r for r in sketch_estimates(
        corpus_sketch(docs, group_by=["source"])).collect()}
    assert by_src["a"].n_docs == 40
    assert by_src["a"].distinct_content_estimate == 1
    assert by_src["a"].est_duplicate_docs == 39
    assert by_src["b"].est_duplicate_docs == 0


def test_incremental_monitoring_via_catalog(spark, tmp_path):
    """The advertised flow: one sketch row appended per increment, any
    window merged later with no corpus rescan."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    batches = [
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        [(3, "gamma delta epsilon"), (4, "alpha beta gamma")],
        [(5, "zeta eta theta iota")],
    ]
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "doc_id long, text string")
        cat.append(corpus_sketch(df).withColumn(
            "batch", F.lit(i)), "corpus_stats")
    merged = sketch_estimates(merge_corpus_sketches(
        cat.read("corpus_stats"))).collect()[0]
    assert merged.n_docs == 5
    assert merged.vocab_estimate == 9  # alpha..iota
    assert merged.distinct_content_estimate == 4  # doc 4 repeats doc 1
    assert merged.est_duplicate_docs == 1
