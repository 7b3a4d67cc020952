"""URL/domain ops: host normalization, suffix-match block/allow
filtering, and weight-generalized packing (BPE-token packs)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.text import (
    domain_stats,
    filter_by_domain,
    pack_documents,
    url_host,
)

ROWS = [
    (1, "https://www.Example.COM/a/b?q=1"),
    (2, "http://ads.spam.com/banner"),
    (3, "https://spam.com/"),
    (4, "https://sub.good.org/page"),
    (5, "not a url"),
    (6, "https://goodspam.com/x"),  # must NOT match spam.com (no dot)
]
SCHEMA = "doc_id long, url string"


def test_url_host_normalization(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.doc_id: r.h
           for r in df.select("doc_id", url_host("url").alias("h")).collect()}
    assert got[1] == "example.com"
    assert got[2] == "ads.spam.com"
    assert got[5] is None


def test_filter_by_domain_block_and_allow(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    bl = spark.createDataFrame([("SPAM.com",)], "domain string")
    blocked = {r.doc_id for r in filter_by_domain(df, bl).collect()}
    assert blocked == {1, 4, 5, 6}  # suffix match kills 2 and 3 only
    allowed = {r.doc_id
               for r in filter_by_domain(df, bl, mode="allow").collect()}
    assert allowed == {2, 3}

    # plan shape: equi-joins only, no BroadcastNestedLoop
    out = filter_by_domain(df, bl)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastNestedLoop" not in buf.getvalue()


def test_domain_stats(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.host: r.n_docs for r in domain_stats(df).collect()}
    assert got["spam.com"] == 1
    assert got["ads.spam.com"] == 1
    assert got[None] == 1


def test_pack_by_weight_column(spark):
    rows = [(i, "x" * (10 * i), 3 * i) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tok int")

    packs = pack_documents(df, weight_col="n_tok", target_chars=40)
    got = sorted(((r.shuffle_pos, r.doc_id, r.n_weight_measured, r.pack_id)
                  for r in packs.collect()))
    # recompute: walk in shuffle order, pack_id = floor((run-1)/target)
    run = 0
    for pos, doc, wt, pack in got:
        assert wt == 3 * doc
        run += wt
        assert pack == (run - 1) // 40
    # default char packing unchanged (column name + semantics)
    chars = pack_documents(df, target_chars=100).collect()
    assert {r.n_chars_measured for r in chars} == {10 * i for i in range(1, 30)}
