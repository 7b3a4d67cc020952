"""Sliding-window chunking: exact parity with a Python recompute plus
the coverage/overlap invariants that make chunks usable as training
windows."""

from __future__ import annotations

import contextlib
import io
import random
import re

from apsviz_timeseriesdb_ingest_spark.llm.text import chunk_documents

SCHEMA = "doc_id long, text string"


def _ref_chunks(text: str, max_tokens: int, overlap: int):
    toks = [t for t in re.split(r"\s+", text) if t]
    stride = max_tokens - overlap
    out = []
    s = 0
    while s < len(toks):
        if s != 0 and s + overlap >= len(toks):
            break
        out.append(toks[s:s + max_tokens])
        s += stride
    return out


def test_chunks_match_python_recompute(spark):
    rng = random.Random("chunks")
    rows = [(i, " ".join(f"w{rng.randrange(50)}"
                         for _ in range(rng.randrange(0, 40))))
            for i in range(60)]
    rows += [(100, "one"), (101, ""), (102, "  "),
             (103, "Keep CASE and, punct!")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {}
    for r in chunk_documents(df, max_tokens=8, overlap=3).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = (
            r.chunk_text, r.n_chunk_tokens)
    for i, text in rows:
        expect = _ref_chunks(text, 8, 3)
        mine = got.get(i, {})
        assert len(mine) == len(expect), (i, text)
        for cid, chunk in enumerate(expect):
            assert mine[cid] == (" ".join(chunk), len(chunk))
    # case/punctuation preserved verbatim
    assert got[103][0][0] == "Keep CASE and, punct!"


def test_chunk_invariants(spark):
    toks = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, toks)], SCHEMA)
    rows = sorted(chunk_documents(df, max_tokens=16, overlap=4).collect(),
                  key=lambda r: r.chunk_id)
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split())
    assert covered == set(toks.split())  # every token appears
    # consecutive chunks share exactly `overlap` tokens (except the tail)
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split()[-4:] == b.chunk_text.split()[:4]
    assert all(r.n_chunk_tokens <= 16 for r in rows)


def test_chunking_plan_is_one_map_stage(spark):
    df = spark.createDataFrame([(1, "a b c")], SCHEMA)
    out = chunk_documents(df, max_tokens=2, overlap=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "SortMergeJoin", "BroadcastHashJoin"):
        assert marker not in plan
