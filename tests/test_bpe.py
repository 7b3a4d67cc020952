"""Distributed BPE: merge-list parity against a pure-Python reference
implementation of Sennrich's algorithm, SQL-vs-pandas engine equality,
and plan shape (the SQL encoder must be Python-free)."""

from __future__ import annotations

import contextlib
import io
import re

from apsviz_timeseriesdb_ingest_spark.llm.bpe import (
    EOW,
    BpeModel,
    bpe_encode_docs,
    subword_vocabulary,
    train_bpe,
    word_pieces,
)

SCHEMA = "doc_id long, text string"

DOCS = [
    (1, "the lower the better the lowest"),
    (2, "low lower lowest lowly low low"),
    (3, "new newer newest news new new"),
    (4, "the newer the better said the newest"),
    (5, "widest wide wider the widest wide"),
    (6, "Lower LOWER lower: no — tokens keep punctuation, lowercased"),
    (7, ""),
    (8, "low"),
]


def _ref_word_counts(rows) -> dict[str, int]:
    counts: dict[str, int] = {}
    for _, text in rows:
        for w in re.split("[ \t\n\x0b\f\r]+", text.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_apply(syms: list[str], a: str, b: str) -> list[str]:
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_train(counts: dict[str, int], num_merges: int,
               min_count: int = 2) -> list[tuple[str, str]]:
    words = {tuple(list(w) + [EOW]): c for w, c in counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_count:
            break
        merges.append((a, b))
        words = {tuple(_ref_apply(list(s), a, b)): c for s, c in words.items()}
    return merges


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    pieces: list[str] = []
    for w in re.split("[ \t\n\x0b\f\r]+", text.lower()):
        if not w:
            continue
        syms = list(w) + [EOW]
        for a, b in merges:
            syms = _ref_apply(syms, a, b)
        pieces.extend(syms)
    return pieces


def test_train_matches_reference_merge_for_merge(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=40)
    expect = _ref_train(_ref_word_counts(DOCS), 40)
    assert list(model.merges) == expect
    assert len(model.merges) > 10  # the corpus genuinely trains


def test_encode_sql_matches_reference_and_pandas(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=25)

    via_sql = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
               for r in bpe_encode_docs(df, model).collect()}
    via_pandas = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
                  for r in bpe_encode_docs(df, model,
                                           engine="pandas").collect()}
    expect = {i: (_ref_encode(t, list(model.merges)),
                  len(_ref_encode(t, list(model.merges))))
              for i, t in DOCS}
    assert via_sql == expect
    assert via_pandas == expect
    assert via_sql[7] == ([], 0)  # empty doc survives with empty tokens

    # frequent words compress to one piece: "low</w>" must be a single
    # token after 25 merges on this corpus
    assert via_sql[8][1] == 1


def test_encode_unseen_words_fall_back_to_chars(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=15)
    unseen = spark.createDataFrame([(99, "zyxw")], SCHEMA)
    got = bpe_encode_docs(unseen, model).collect()[0]
    assert list(got.bpe_tokens) == _ref_encode("zyxw", list(model.merges))
    assert got.n_bpe_tokens >= 4  # no merges learned for these chars


def test_word_pieces_concat_invariant(spark):
    """Pieces always concatenate back to word + eow, whatever the merges
    did (the underlying string is invariant under BPE)."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=30)
    words = spark.createDataFrame(
        [("lowest",), ("newest",), ("the",), ("a",)], "word string")
    for r in word_pieces(words, model).collect():
        assert "".join(r.pieces) == r.word + EOW


def test_sql_encoder_plan_is_python_free(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = BpeModel(merges=(("l", "o"), ("lo", "w")))
    out = bpe_encode_docs(df, model)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_min_count_stops_before_memorizing(spark):
    # every adjacent pair occurs once -> best count 1 < min_count=2
    singles = spark.createDataFrame([(1, "qa wb ec")], SCHEMA)
    model = train_bpe(singles, num_merges=10, min_count=2)
    assert model.merges == ()


def test_sampled_training_is_deterministic(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    m1 = train_bpe(df, num_merges=12, sample_fraction=0.7)
    m2 = train_bpe(df, num_merges=12, sample_fraction=0.7)
    assert m1.merges == m2.merges


def test_subword_vocabulary(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=20)
    encoded = bpe_encode_docs(df, model)
    vocab = {r.piece: (r.n_uses, r.n_docs)
             for r in subword_vocabulary(encoded).collect()}
    # recompute from the reference encoding
    expect_uses: dict[str, int] = {}
    expect_docs: dict[str, int] = {}
    for _, t in DOCS:
        pieces = _ref_encode(t, list(model.merges))
        for p in pieces:
            expect_uses[p] = expect_uses.get(p, 0) + 1
        for p in set(pieces):
            expect_docs[p] = expect_docs.get(p, 0) + 1
    assert vocab == {p: (expect_uses[p], expect_docs[p]) for p in expect_uses}


def test_null_text_encodes_empty_on_both_engines(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(df, num_merges=10)
    with_null = spark.createDataFrame([(50, None), (51, "low")], SCHEMA)
    for engine in ("sql", "pandas"):
        got = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
               for r in bpe_encode_docs(with_null, model,
                                        engine=engine).collect()}
        assert got[50] == ([], 0), engine  # NOT ['n','o','n','e</w>']
        assert got[51][1] >= 1


def test_batched_training_valid_and_faster_in_passes(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    m1 = train_bpe(df, num_merges=24, batch=1)
    m8 = train_bpe(df, num_merges=24, batch=8)
    # batch=1 stays exact Sennrich
    assert list(m1.merges) == _ref_train(_ref_word_counts(DOCS), 24)
    # batched merges are pairwise non-interacting within each pass by
    # construction; the resulting tokenizer must still be VALID: pieces
    # concatenate back to the word, and encode==reference-sequential
    got = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_encode_docs(df, m8).collect()}
    for i, t in DOCS:
        assert got[i] == _ref_encode(t, list(m8.merges))
    # and it compresses comparably (within 20% of exact BPE's tokens)
    n1 = sum(len(_ref_encode(t, list(m1.merges))) for _, t in DOCS)
    n8 = sum(len(_ref_encode(t, list(m8.merges))) for _, t in DOCS)
    assert n8 <= n1 * 1.2
    assert len(m8.merges) == 24


def test_merge_pairs_fold_equals_sequential_on_random_words(spark):
    """One fused multi-pair pass must equal sequential single-merge
    application for ANY conflict-free batch — checked on hundreds of
    random symbol arrays in a single Spark job."""
    import random

    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.bpe import _merge_pairs_expr

    rng = random.Random("fold-equiv")
    alphabet = ["a", "b", "c", "d", "e"]
    # conflict-free batch incl. a self-pair: symbols and outputs disjoint
    pairs = [("a", "b"), ("c", "c"), ("d", "e")]
    words = [[rng.choice(alphabet)
              for _ in range(rng.randrange(1, 12))] for _ in range(300)]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i int, syms array<string>")
    got = {r.i: list(r.out) for r in df.select(
        "i", _merge_pairs_expr(F.col("syms"), pairs).alias("out")).collect()}
    for i, w in enumerate(words):
        expect = list(w)
        for a, b in pairs:  # sequential reference
            expect = _ref_apply(expect, a, b)
        assert got[i] == expect, (i, w)


def test_delta_pair_counts_match_full_recount(spark):
    """pair_counts='delta' (incremental maintenance) must select the
    bit-for-bit identical merge sequence as the full per-pass recount,
    across batch sizes and through the early-stop path."""
    from apsviz_timeseriesdb_ingest_spark.llm.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, "the bright lighthouse lights the nightly coastline "
             "while weather stations watch the rising water")
         for i in range(5)] +
        [(10, "shuffle partitions shuffle again nightly"),
         (11, "coastline weather rising rising rising water"),
         (12, "aaa aab aba abb baa bab bba bbb")],
        "doc_id long, text string")
    for batch in (1, 4):
        full = train_bpe(docs, num_merges=24, batch=batch,
                         pair_counts="full")
        delta = train_bpe(docs, num_merges=24, batch=batch,
                          pair_counts="delta")
        assert full.merges == delta.merges, batch
    # early stop (min_count exhausts pairs) behaves identically
    full = train_bpe(docs, num_merges=500, batch=8, min_count=3,
                     pair_counts="full")
    delta = train_bpe(docs, num_merges=500, batch=8, min_count=3,
                      pair_counts="delta")
    assert full.merges == delta.merges

    import pytest
    with pytest.raises(ValueError, match="pair_counts"):
        train_bpe(docs, num_merges=2, pair_counts="bogus")
