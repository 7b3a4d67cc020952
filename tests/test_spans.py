"""Substring-span dedup: planted shared passages found with exact
bounds, DuckDB-recomputed parity on the documents testdata, and the
mask step removing exactly the spanned tokens."""

from __future__ import annotations

import duckdb

from apsviz_timeseriesdb_ingest_spark.llm.spans import (
    duplicate_spans,
    mask_duplicate_spans,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

SCHEMA = "doc_id long, text string"

PASSAGE = ("the license permits redistribution provided that the above "
           "notice appears")  # 10 tokens


def _docs(spark):
    rows = [
        # passage at token positions 4..13 of doc 1
        (1, "alpha beta gamma delta " + PASSAGE + " omega psi"),
        # same passage at positions 0..9 of doc 2
        (2, PASSAGE + " entirely different tail content here"),
        # unique text: no duplicated shingles
        (3, "completely unrelated prose about tide gauges and water "
            "levels at coastal stations"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_planted_passage_found_with_exact_bounds(spark):
    spans = {(r.doc_id, r.span_start, r.span_end, r.n_shingles)
             for r in duplicate_spans(_docs(spark), k=3).collect()}
    # 10 shared tokens -> 8 duplicated 3-shingles; doc 1 offset 4
    assert spans == {(1, 4, 11, 8), (2, 0, 7, 8)}


def test_min_span_drops_incidental_collisions(spark):
    docs = spark.createDataFrame(
        [(1, "one shared trigram here in otherwise unique text alpha"),
         (2, "totally different words but one shared trigram appears")],
        SCHEMA)
    # the docs share only the 3-gram "one shared trigram" -> 1-shingle run
    assert duplicate_spans(docs, k=3, min_span_shingles=2).count() == 0
    got = duplicate_spans(docs, k=3, min_span_shingles=1).collect()
    assert {r.n_shingles for r in got} == {1}


def test_max_doc_freq_ignores_boilerplate(spark):
    boiler = "all rights reserved worldwide forever"
    docs = spark.createDataFrame(
        [(i, f"document number {i} unique body text " + boiler)
         for i in range(10)], SCHEMA)
    everywhere = duplicate_spans(docs, k=3, min_span_shingles=1)
    assert everywhere.count() > 0
    capped = duplicate_spans(docs, k=3, min_span_shingles=1, max_doc_freq=5)
    assert capped.count() == 0


def test_spans_match_duckdb_on_testdata(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    got = sorted(map(tuple, duplicate_spans(docs, k=3).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    exp = sorted(map(tuple, con.execute("""
        WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ts
             FROM documents),
        lst AS (SELECT doc_id, [{'pos': i-1, 'sh': array_to_string(ts[i:i+2], ' ')}
                FOR i IN generate_series(1, greatest(len(ts)-2, 1))] AS l FROM toks),
        pos AS (SELECT doc_id AS doc, unnest(l, recursive := true) FROM lst),
        p AS (SELECT doc, pos, sh FROM pos WHERE sh <> ''),
        dup AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc) AS c
                FROM p GROUP BY sh) WHERE c >= 2),
        m AS (SELECT doc, pos, row_number() OVER (PARTITION BY doc ORDER BY pos) AS rn
              FROM p WHERE sh IN (SELECT sh FROM dup))
        SELECT doc AS doc_id, min(pos) AS span_start, max(pos) AS span_end,
               CAST(count(*) AS BIGINT) AS n_shingles
        FROM m GROUP BY doc, pos - rn HAVING count(*) >= 2
    """).fetchall()))
    assert got == exp and got  # non-empty: testdata plants near-dups


def test_mask_removes_exactly_the_spanned_tokens(spark):
    docs = _docs(spark)
    spans = duplicate_spans(docs, k=3)
    out = {r.doc_id: r for r in
           mask_duplicate_spans(docs, spans, k=3).collect()}
    assert out[1].deduped_text == "alpha beta gamma delta omega psi"
    assert out[1].n_tokens_removed == 10
    assert out[2].deduped_text == "entirely different tail content here"
    assert out[2].n_tokens_removed == 10
    # untouched doc passes through token-normalized, nothing removed
    assert out[3].n_tokens_removed == 0
    assert "tide gauges" in out[3].deduped_text


BOILER = "Subscribe to our newsletter for updates"


def test_paragraph_dedup_keep_first_semantics(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.spans import dedup_paragraphs

    docs = [
        (1, f"Unique intro one.\n\n{BOILER}\n\nBody of doc one."),
        # indentation/case variant of the boilerplate must collapse
        (2, f"Different text two.\n\n  subscribe TO our\tnewsletter "
            "for updates \n\nMore two."),
        (3, f"{BOILER}\n\nOnly other content three."),
        (4, "Entirely unique document four."),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    got = {r.doc_id: r for r in dedup_paragraphs(df).collect()}

    # winner = smallest (doc, pos): doc 1 keeps its verbatim copy
    assert got[1].deduped_text == docs[1 - 1][1]
    assert (got[1].n_paragraphs, got[1].n_removed) == (3, 0)
    # losers lose exactly the boilerplate, keep their own text verbatim
    assert got[2].deduped_text == "Different text two.\n\nMore two."
    assert got[2].n_removed == 1
    assert got[3].deduped_text == "Only other content three."
    assert got[3].n_removed == 1
    assert got[4].deduped_text == docs[4 - 1][1]
    # paragraph-free docs survive with empty text
    assert (got[5].deduped_text, got[5].n_paragraphs, got[5].n_removed) \
        == ("", 0, 0)


def test_paragraph_dedup_mode_all_and_min_chars(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.spans import dedup_paragraphs

    docs = [(1, f"Intro\n\n{BOILER}\n\nA"),
            (2, f"Intro\n\n{BOILER}\n\nB")]
    df = spark.createDataFrame(docs, SCHEMA)
    # mode="all": every occurrence cut, incl. the would-be winner
    got = {r.doc_id: r for r in
           dedup_paragraphs(df, mode="all", min_chars=10).collect()}
    assert got[1].deduped_text == "Intro\n\nA"
    assert got[2].deduped_text == "Intro\n\nB"
    # "Intro" repeats but is under min_chars -> exempt in both docs
    assert got[1].n_removed == got[2].n_removed == 1


def test_paragraph_dedup_within_doc_repeats(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.spans import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "Repeated paragraph text.\n\nMiddle bit.\n\n"
             "Repeated paragraph text.")], SCHEMA)
    got = dedup_paragraphs(df).collect()[0]
    # occurrence-count semantics: the second in-doc copy is removed
    assert got.deduped_text == "Repeated paragraph text.\n\nMiddle bit."
    assert got.n_removed == 1


def test_split_sentences(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.spans import split_sentences

    docs = spark.createDataFrame(
        [(1, "First sentence. Second one! Third?\nFourth on a new line"),
         (2, "No terminal punctuation at all"),
         (3, ""),
         (4, "Spaces...   everywhere.  ")],
        "doc_id long, text string")
    out: dict = {}
    for r in split_sentences(docs).collect():
        out.setdefault(r.doc_id, []).append((r.sentence_id, r.sentence))
    for v in out.values():
        v.sort()
    assert [s for _, s in out[1]] == [
        "First sentence.", "Second one!", "Third?", "Fourth on a new line"]
    assert [i for i, _ in out[1]] == [0, 1, 2, 3]  # contiguous positions
    assert [s for _, s in out[2]] == ["No terminal punctuation at all"]
    assert 3 not in out  # empty text -> no sentences
    # trailing whitespace after the final boundary is consumed as a
    # delimiter; the empty tail element is filtered
    assert [s for _, s in out[4]] == ["Spaces...", "everywhere."]

    # composition: sentence-grain keep-first dedup across docs
    two = spark.createDataFrame(
        [(1, "Shared boilerplate sentence here. Unique alpha."),
         (2, "Shared boilerplate sentence here. Unique beta.")],
        "doc_id long, text string")
    sents = split_sentences(two)
    from pyspark.sql import functions as F
    first = (sents.groupBy(F.lower(F.trim("sentence")).alias("k"))
             .agg(F.min(F.struct("doc_id", "sentence_id")).alias("w"))
             .select("w.doc_id", "w.sentence_id"))
    kept = sents.join(first, ["doc_id", "sentence_id"], "left_semi")
    assert kept.count() == 3  # boilerplate survives once
