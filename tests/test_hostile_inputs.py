"""Hostile-corpus sweep: every per-document operator must COMPLETE
(no ANSI aborts — the r4 shingle lesson) and account for every input
row on a corpus of NULLs, empties, whitespace, control characters,
unicode, and megatoken lines. Semantic assertions are minimal by
design; the gate here is 'one bad document must never kill a
distributed job'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOSTILE = [
    (1, None),                                  # NULL text
    (2, ""),                                    # empty
    (3, "   \t  \n  "),                         # whitespace only
    (4, "one"),                                 # single token
    (5, "two words"),                           # sub-shingle
    (6, "café naïve \U0001f600 中文 tokens"),  # unicode
    (7, "a" * 5000),                            # one megatoken
    (8, "line one\n\nline two\n\nline one"),    # paragraphs
    (9, "nul\x00byte and bell\x07 chars"),      # control chars
    (10, "the quick brown fox jumps over the lazy dog"),  # normal
]


@pytest.fixture(scope="module")
def hostile(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, text string") \
        .localCheckpoint(eager=True)


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_text_signal_operators_total(spark, hostile):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        c4_line_filter,
        chunk_documents,
        clean_text,
        compression_ratio,
        document_fingerprint,
        gopher_quality_stats,
        language_id,
        pack_documents,
        remove_repeated_lines,
        repetition_stats,
        scrub_pii,
        text_stats,
    )

    all_ids = set(range(1, 11))
    for op in (text_stats, scrub_pii, repetition_stats, language_id,
               document_fingerprint, gopher_quality_stats,
               remove_repeated_lines, c4_line_filter, clean_text,
               compression_ratio):
        out = op(hostile)
        assert _ids(out) == all_ids, op.__name__
    # chunking drops nothing it shouldn't: every doc with >= 1 token
    # appears; NULL/empty/whitespace docs simply yield no chunks
    chunked = chunk_documents(hostile, max_tokens=4, overlap=1)
    assert _ids(chunked) == {4, 5, 6, 7, 8, 9, 10}
    # packing accounts for every row including NULL text
    packed = pack_documents(hostile)
    assert _ids(packed) == all_ids


def test_dedup_operators_total(spark, hostile):
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import (
        exact_dedup,
        minhash_band_buckets,
        ngram_jaccard_pairs,
        simhash,
        simhash_neardup_pairs,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.spans import (
        dedup_paragraphs,
        duplicate_spans,
        split_sentences,
    )

    assert sum(r.n_copies for r in exact_dedup(
        hostile.filter(F.col("text").isNotNull())).collect()) == 9
    simhash(hostile).collect()
    simhash_neardup_pairs(hostile, bits=60, max_hamming=4).collect()
    minhash_band_buckets(hostile, k=3, num_hashes=8, bands=4).collect()
    ngram_jaccard_pairs(hostile, threshold=0.5).collect()
    duplicate_spans(hostile, k=3).collect()
    assert _ids(dedup_paragraphs(hostile)) == set(range(1, 11))
    split_sentences(hostile).collect()


def test_lm_and_embedding_operators_total(spark, hostile):
    from apsviz_timeseriesdb_ingest_spark.llm.lm import (
        min_k_prob,
        perplexity,
        perplexity_ngram,
        train_bigram_lm,
        train_ngram_lm,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        brute_force_topk,
        hash_embedding,
    )

    lm2 = train_bigram_lm(hostile)
    assert _ids(perplexity(hostile, lm2)) == set(range(1, 11))
    lm3 = train_ngram_lm(hostile, n=3)
    assert _ids(perplexity_ngram(hostile, lm3)) == set(range(1, 11))
    assert _ids(perplexity_ngram(hostile, lm3, hot_grams=5)) == \
        set(range(1, 11))
    assert _ids(min_k_prob(hostile, lm3)) == set(range(1, 11))
    emb = hash_embedding(hostile, dim=16)
    assert _ids(emb) == set(range(1, 11))
    brute_force_topk(emb.withColumnRenamed("doc_id", "vec_id"),
                     query_ids=[10], top_k=3,
                     vec_col="embedding").collect()


def test_url_operators_total(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        canonical_url,
        domain_stats,
        url_dedup,
        url_host,
    )

    urls = spark.createDataFrame(
        [(1, None), (2, ""), (3, "::::"), (4, "http://"),
         (5, "ftp://weird.host:21/x"), (6, "https://ok.example/a?b=1"),
         (7, "http://host:99999/port-out-of-range"),
         (8, "https://example.com/" + "p" * 3000)],
        "doc_id long, url string")
    urls.select(url_host("url"), canonical_url("url")).collect()
    assert sum(r.n_copies for r in url_dedup(urls).collect()) == 8
    domain_stats(urls).collect()


def test_tokenizers_total(spark, hostile):
    from apsviz_timeseriesdb_ingest_spark.llm.bpe import (
        bpe_encode_docs,
        train_bpe,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.unigram import (
        train_unigram,
        unigram_encode_docs,
    )

    model = train_bpe(hostile, num_merges=6, min_count=1)
    for engine in ("sql", "pandas"):
        enc = bpe_encode_docs(hostile, model, engine=engine)
        assert _ids(enc) == set(range(1, 11)), engine
    uni = train_unigram(hostile, vocab_size=40, seed_size=80, em_iters=1)
    assert _ids(unigram_encode_docs(hostile, uni)) == set(range(1, 11))


def test_pipeline_total_on_hostile_corpus(spark, hostile):
    """The full prep pipeline runs end to end and the audit accounts
    for EVERY hostile row."""
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
        prepare_training_corpus,
    )

    corpus, audit = prepare_training_corpus(
        hostile, hostile.filter(F.col("doc_id") == 10),
        min_tokens=2, languages=("en",),
        profiles={"en": ("the", "over", "words")})
    assert _ids(audit) == set(range(1, 11))
    assert corpus.count() + audit.filter(
        F.col("drop_reason").isNotNull()).count() == 10


def test_normalize_unicode_collapses_equivalent_forms(spark):
    """NFC vs NFD 'café' are byte-different but visually identical:
    after normalization every dedup grain treats them as one document;
    without it exact_dedup keeps both (the gap this operator closes).
    NULL text and non-text columns ride through untouched."""
    import unicodedata

    from apsviz_timeseriesdb_ingest_spark.llm.dedup import exact_dedup
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
        prepare_training_corpus,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.text import normalize_unicode

    nfc = unicodedata.normalize("NFC", "café au lait")
    nfd = unicodedata.normalize("NFD", "café au lait")
    assert nfc != nfd
    docs = spark.createDataFrame(
        [(1, nfc, "a"), (2, nfd, "b"), (3, None, "c"),
         (4, "ｆｕｌｌｗｉｄｔｈ ｆｏｒｍｓ", "d")],
        "doc_id long, text string, source string")

    raw_groups = exact_dedup(docs.filter("text is not null")).count()
    norm = normalize_unicode(docs, form="NFKC")
    assert {r.source for r in norm.collect()} == {"a", "b", "c", "d"}
    got = {r.doc_id: r.text for r in norm.collect()}
    assert got[1] == got[2]           # forms collapsed
    assert got[3] is None             # NULL rides through
    assert got[4] == "fullwidth forms"  # NFKC compatibility folding
    assert exact_dedup(norm.filter("text is not null")).count() \
        == raw_groups - 1

    # pipeline wiring: the forms collapse into one exact-dup group
    corpus, audit = prepare_training_corpus(
        docs.filter("text is not null"), None, min_tokens=1,
        languages=("en",), profiles={"en": ("au", "forms")},
        unicode_form="NFKC")
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons[2] == "exact_dup"  # NFD copy lost to the NFC doc

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown normalization"):
        normalize_unicode(docs, form="NFX")


def test_embedding_operators_on_hostile_vectors(spark):
    """Zero vectors, NULL embeddings, and duplicate vectors through the
    ANN/similarity stack: completion + accounting, no ANSI aborts, no
    NaN poisoning of rankings."""
    import math

    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        brute_force_topk,
        embedding_neardup_pairs,
        hyperplane_coefficients,
        ivf_assign,
        kmeans_assign,
    )

    dim = 8
    rows = [
        (1, [0.0] * dim),                        # zero vector
        (2, None),                               # NULL embedding
        (3, [1.0] + [0.0] * (dim - 1)),
        (4, [1.0] + [0.0] * (dim - 1)),          # exact duplicate of 3
        (5, [0.5] * dim),
        (6, [-0.5] * dim),
        (7, [float(i) for i in range(dim)]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ok = vecs.filter("embedding is not null")

    top = brute_force_topk(ok, query_ids=[3, 1], top_k=2)
    got = {(r.query_id, r.rank): r.neighbor_id for r in top.collect()}
    assert got[(3, 1)] == 4              # the duplicate wins at cosine 1
    assert len([k for k in got if k[0] == 1]) == 2  # zero vec still ranks

    cents = kmeans_assign(ok, hyperplane_coefficients(dim=dim, planes=3))
    assert {r.vec_id for r in cents.collect()} == {1, 3, 4, 5, 6, 7}
    assert cents.filter("centroid_id is null").count() == 0

    iv = ivf_assign(ok, centroid_ids=[3, 5])
    assert {r.vec_id for r in iv.collect()} == {1, 3, 4, 5, 6, 7}

    pairs = embedding_neardup_pairs(ok, threshold=0.9, dim=dim,
                                    planes=3, bands=2)
    found = {(r.vec_id_a, r.vec_id_b) for r in pairs.collect()}
    assert (3, 4) in found
    for a, b, s in ((r.vec_id_a, r.vec_id_b, r.sim)
                    for r in pairs.collect()):
        assert s is None or not math.isnan(s)


def test_hostile_minhash_stream_survives(spark, tmp_path):
    """The incremental MinHash dedup STREAM on the hostile corpus: the
    r4 sweep covered the batch operators; the stream wraps the same
    plan in foreachBatch where one ANSI abort kills the query. Gate:
    every batch completes — including an EMPTY batch — and every doc is
    accounted (no shingles -> nothing to collide with -> accepted)."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_dedup_stream)

    src = str(tmp_path / "in")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    sch = "doc_id long, text string"
    spark.createDataFrame(HOSTILE, sch).write.mode("append").parquet(src)
    q = run_incremental_dedup_stream(
        spark, src, catalog, checkpoint_dir=str(tmp_path / "ck"),
        k=2, num_hashes=8, bands=4)
    assert q.awaitTermination(120)
    assert _ids(catalog.read("stream_corpus")) == set(range(1, 11))

    # empty micro-batch: a 0-row file must be a clean no-op
    spark.createDataFrame([], sch).write.mode("append").parquet(src)
    q2 = run_incremental_dedup_stream(
        spark, src, catalog, checkpoint_dir=str(tmp_path / "ck"),
        k=2, num_hashes=8, bands=4)
    assert q2.awaitTermination(120)
    assert catalog.read("stream_corpus").count() == 10


def test_hostile_embedding_stream_survives(spark, tmp_path):
    """The incremental embedding dedup STREAM on hostile vectors: a
    zero-norm vector in the BATCH and in the STORED corpus both take
    the guarded cosine (the r4 sweep's ninth, missed division site —
    VERDICT r4 finding #1); NULL embeddings are gated out; an empty
    batch no-ops; a fresh-checkpoint replay stays a corpus no-op even
    for the zero vector (same-id rejection, since its guarded
    self-cosine is 0 rather than 1)."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_embedding_stream)

    dim = 4
    centroids = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
    src = str(tmp_path / "in")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    sch = "vec_id long, embedding array<float>"

    def _run(ck):
        q = run_incremental_embedding_stream(
            spark, src, catalog, centroids, checkpoint_dir=str(tmp_path / ck),
            threshold=0.9, nprobe=2, dim=dim)
        assert q.awaitTermination(120)

    # batch 1 seeds the corpus WITH a zero vector + a NULL embedding
    spark.createDataFrame(
        [(1, [0.0] * dim), (2, None), (3, [1.0, 0.0, 0.0, 0.0])],
        sch).write.mode("append").parquet(src)
    _run("ck")
    got = {r.vec_id for r in catalog.read("ann_corpus").collect()}
    assert got == {1, 3}  # NULL gated; zero vector accepted (cosine 0)

    # batch 2 probes the stored zero vector (stored-side __snrm == 0)
    # and brings its own zero vector (batch-side __nrm == 0)
    spark.createDataFrame(
        [(4, [0.0] * dim), (5, [0.99, 0.01, 0.0, 0.0]), (6, None)],
        sch).write.mode("append").parquet(src)
    _run("ck")
    got = {r.vec_id for r in catalog.read("ann_corpus").collect()}
    # 5 ~= 3 rejected via corpus probe; 4 is a SECOND zero vector — its
    # cosine to stored zero-vec 1 is guarded to 0, so it is accepted
    assert got == {1, 3, 4}

    # empty micro-batch: clean no-op
    spark.createDataFrame([], sch).write.mode("append").parquet(src)
    _run("ck")
    assert catalog.read("ann_corpus").count() == 3

    # fresh-checkpoint replay of ALL input: zero vectors rejected by
    # same-id match, nonzero by cosine 1 self-match — corpus unchanged
    _run("ck2")
    rows = catalog.read("ann_corpus").collect()
    assert {r.vec_id for r in rows} == {1, 3, 4} and len(rows) == 3


def test_drift_report_empty_windows(spark):
    """drift_report/flag_drift over empty or one-sided stats windows:
    no crash, NULL metrics never alert; grouped full-outer fills hold
    when one side has zero rows."""
    from apsviz_timeseriesdb_ingest_spark.llm.sketches import (
        corpus_stats_row, drift_report, flag_drift)

    schema = "doc_id long, text string, source string"
    full = corpus_stats_row(
        spark.createDataFrame([(1, "alpha beta", "web")], schema),
        group_by=["source"])
    empty = full.filter("n_docs < 0")  # zero stats rows, same schema

    rep = drift_report(empty, full, group_by=["source"]).collect()
    assert len(rep) == 1 and rep[0].n_docs_base == 0 \
        and rep[0].n_docs_win == 1
    flagged = flag_drift(drift_report(empty, full,
                                      group_by=["source"])).collect()[0]
    assert not flagged.flag_vocab_ratio  # NULL ratio: no alert
    other = drift_report(full, empty, group_by=["source"]).collect()[0]
    assert other.n_docs_win == 0 and other.top_token_jaccard == 0.0


def test_skipping_probes_hostile_values(spark, tmp_path):
    """Empty IN-lists, all-NULL probe lists, and empty prefixes through
    the zone-map probes: correct (empty/full) results, never a crash."""
    import pyspark.sql.functions as F

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
        build_skipping, read_equals, read_prefix)
    from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
        prune_files_in, prune_files_prefix)

    catalog = Catalog(spark, str(tmp_path / "wh"))
    catalog.overwrite(spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name")), "t",
        refresh_skipping=False)
    build_skipping(catalog, "t", range_cols=["k", "name"])
    zm = catalog.read("t__zm")
    assert prune_files_in(zm, "k", [], path=catalog.path("t")) == []
    assert prune_files_in(zm, "k", [None], path=catalog.path("t")) == []
    assert read_equals(catalog, "t", "k", []).count() == 0
    # the empty prefix matches everything: no file can be pruned
    from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
        list_parquet_files)
    assert set(prune_files_prefix(zm, "name", "",
                                  path=catalog.path("t"))) == \
        set(list_parquet_files(catalog.path("t")))
    assert read_prefix(catalog, "t", "name", "").count() == 20
