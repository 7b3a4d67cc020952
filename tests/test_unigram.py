"""Unigram-LM tokenizer: the distributed trainer must match the serial
reference implementation piece-for-piece (the decimal-summed E-step
makes the distributed aggregation order-independent), and Viterbi
encoding must reassemble documents exactly."""

from __future__ import annotations

import math
import re

from apsviz_timeseriesdb_ingest_spark.llm.unigram import (
    UnigramModel,
    _train_unigram_py,
    _viterbi_py,
    train_unigram,
    unigram_encode_docs,
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog near the river"),
    (1, "the quick brown fox likes the quiet river bank in the morning"),
    (2, "a lazy dog sleeps near the river bank every quiet morning"),
    (3, "quick foxes and quiet dogs make the morning lively"),
    (4, "the riverbank morning fog rolls over the lazy quiet dog"),
    (5, "brown dogs jump over quick foxes near quiet river banks"),
]


def _py_word_counts(rows):
    wc: dict[str, int] = {}
    for _, text in rows:
        for w in re.split(r"\s+", text.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def test_unigram_train_matches_serial(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    kw = dict(vocab_size=40, seed_size=120, max_piece_len=6,
              em_iters=2, prune_frac=0.2)
    got = train_unigram(docs, **kw)
    exp = _train_unigram_py(_py_word_counts(ROWS), **kw)
    assert got.pieces == exp.pieces
    assert len(got.pieces) <= 40 + 0  # pruned to target (chars may floor it)
    for a, b in zip(got.log_probs, exp.log_probs):
        assert abs(a - b) < 1e-9
    # a proper distribution: probs sum to 1
    assert abs(sum(math.exp(p) for p in got.log_probs) - 1.0) < 1e-9
    # multi-char pieces were actually learned
    assert any(len(p) > 2 for p in got.pieces)


def test_unigram_encode_matches_viterbi_and_concat(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    model = train_unigram(docs, vocab_size=40, seed_size=120,
                          max_piece_len=6)
    out = {r.doc_id: r for r in
           unigram_encode_docs(docs, model, max_piece_len=6).collect()}
    logp = model.as_dict()
    for doc_id, text in ROWS:
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        expect = [p for w in words for p in _viterbi_py(w, logp, 6)]
        assert list(out[doc_id].unigram_tokens) == expect
        assert out[doc_id].n_unigram_tokens == len(expect)
        # concat invariant: pieces reassemble the words exactly
        assert "".join(expect) == "".join(words)


def test_unigram_unknown_chars_and_empty(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    model = train_unigram(docs, vocab_size=30, seed_size=80,
                          max_piece_len=6)
    # unseen characters segment via the UNK floor — encoding is total
    weird = spark.createDataFrame([(99, "zzz? quick über fox")],
                                  "doc_id long, text string")
    row = unigram_encode_docs(weird, model, max_piece_len=6).collect()[0]
    assert "".join(row.unigram_tokens) == "zzz?quicküberfox"

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert train_unigram(empty) == UnigramModel(pieces=(), log_probs=())
    # null text encodes to an empty token array, doc preserved
    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = unigram_encode_docs(nulls, model).collect()[0]
    assert r.unigram_tokens == [] and r.n_unigram_tokens == 0


def test_unigram_compression_beats_chars(spark):
    """The learned vocabulary must actually compress: fewer pieces than
    characters, on held-in text."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    model = train_unigram(docs, vocab_size=50, seed_size=150,
                          max_piece_len=8)
    out = unigram_encode_docs(docs, model, max_piece_len=8).collect()
    n_pieces = sum(r.n_unigram_tokens for r in out)
    n_chars = sum(len(w) for _, t in ROWS
                  for w in re.split(r"\s+", t.lower()) if w)
    assert n_pieces < 0.7 * n_chars


def test_subword_regularization_sampling(spark):
    """The sampling encoder: deterministic per (word, seed), diverse
    across seeds, concat-invariant, and empirical draw frequencies track
    the lattice distribution on a controlled two-segmentation word."""
    from apsviz_timeseriesdb_ingest_spark.llm.unigram import _sample_py

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    model = train_unigram(docs, vocab_size=40, seed_size=120,
                          max_piece_len=6)

    s1 = unigram_encode_docs(docs, model, max_piece_len=6,
                             sample_alpha=1.0, sample_seed="e0").collect()
    s2 = unigram_encode_docs(docs, model, max_piece_len=6,
                             sample_alpha=1.0, sample_seed="e0").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # reproducible
    for r in s1:  # concat invariance survives sampling
        text = dict(ROWS)[r.doc_id]
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        assert "".join(r.unigram_tokens) == "".join(words)
    # (the tiny trained model is confident enough that two seeds can
    # legitimately agree corpus-wide; seed diversity is asserted below
    # on the controlled lattice instead)

    # controlled lattice: pieces {ab, c, a, bc} over "abc" → segs
    # [ab,c] and [a,bc] with probs ∝ p(ab)p(c) vs p(a)p(bc)
    logp = {"ab": math.log(0.4), "c": math.log(0.1),
            "a": math.log(0.2), "bc": math.log(0.3), "b": math.log(0.0001)}
    p1 = 0.4 * 0.1          # [ab, c]
    p2 = 0.2 * 0.3          # [a, bc]
    want = p1 / (p1 + p2)   # ≈ 0.4 (ignoring the tiny b-path)
    draws = [tuple(_sample_py("abc", logp, 4, 1.0, f"s{i}"))
             for i in range(2000)]
    assert len(set(draws)) >= 2  # seeds actually diversify
    n1 = draws.count(("ab", "c"))
    assert abs(n1 / 2000 - want) < 0.05
    # alpha -> large approaches Viterbi (the argmax segmentation)
    hard = [_sample_py("abc", logp, 4, 50.0, f"s{i}") for i in range(50)]
    assert all(h == ["a", "bc"] for h in hard)
