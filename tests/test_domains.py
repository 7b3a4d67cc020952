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


def test_remove_repeated_lines(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        remove_repeated_lines,
    )

    doc = ("This is the first interesting line\n"
           "* a\n"
           "THIS IS   the first interesting line\n"
           "A different second line of content\n"
           "* a\n"
           "This is the first interesting line")
    df = spark.createDataFrame([(1, doc), (2, "single line only here")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in remove_repeated_lines(df).collect()}
    assert got[1].deduped_text == ("This is the first interesting line\n"
                                   "* a\n"
                                   "A different second line of content\n"
                                   "* a")  # short bullet exempt twice
    assert (got[1].n_lines, got[1].n_removed) == (6, 2)
    assert got[2].deduped_text == "single line only here"
    assert got[2].n_removed == 0


def test_corpus_manifest_order_independent_duckdb(spark, sf_oracle):
    import duckdb

    from apsviz_timeseriesdb_ingest_spark.functions.portable_hash import (
        md5_hash64_sql,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.text import corpus_manifest
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    docs = load_table(spark, sf_oracle, "documents")
    row = corpus_manifest(docs).collect()[0]
    # shuffled/partitioned differently -> identical checksum
    row2 = corpus_manifest(docs.repartition(13).sort(F.desc("doc_id"))) \
        .collect()[0]
    assert row.asDict() == row2.asDict()

    h = md5_hash64_sql("doc_id || '|' || text")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_oracle}/documents.parquet')")
    n_docs, checksum = con.execute(
        f"SELECT count(*), bit_xor({h}) FROM documents").fetchone()
    assert (row.n_docs, row.corpus_checksum) == (n_docs, checksum)


def test_gopher_quality_stats_and_reasons(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        gopher_drop_reason,
        gopher_quality_stats,
    )

    doc1 = "the cat and a dog is to walk... now then"
    rows = [(1, doc1),
            # all-bullet lines (word lengths kept legal)
            (2, "- oneish\n- twoish\n- threeish\n* fourish"),
            # symbol-heavy: 16 '#' chars over 5 tokens
            (3, "#### #### #### #### theword"),
            # numeric-heavy: only 3 of 10 tokens contain a letter
            (5, "zzz qqq www 12345 45678 78901 00012 11123 22234 33345")]
    df = spark.createDataFrame(rows + [(4, "")], "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_stats(df).collect()}

    # python recompute for doc 1
    toks = doc1.lower().split()
    assert got[1].n_tokens == len(toks)
    assert got[1].mean_word_chars == round(
        sum(len(t) for t in toks) / len(toks), 6)
    assert got[1].symbol_word_ratio == round(1 / len(toks), 6)  # one '...'
    assert got[1].stop_hits >= 4
    assert got[1].bullet_line_ratio == 0.0
    assert got[1].ellipsis_line_ratio == 0.0  # '...' is mid-line

    assert got[2].bullet_line_ratio == 1.0
    assert got[3].symbol_word_ratio == round(16 / 5, 6)
    assert got[5].alpha_word_ratio == round(3 / 10, 6)
    # empty doc: ratios NULL, nothing to gate on
    assert got[4].mean_word_chars is None

    reasons = {r.doc_id: r.reason for r in
               gopher_quality_stats(df)
               .withColumn("reason", gopher_drop_reason()).collect()}
    assert reasons[1] is None  # ratio 0.1 is NOT > 0.1 — boundary keeps
    assert reasons[2] == "bullet_lines"
    assert reasons[3] == "symbol_ratio"
    assert reasons[5] == "non_alpha_words"
    assert reasons[4] is None  # NULL ratios never drop


def test_repetition_multi_ngram_orders(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import repetition_stats

    text = "a b c a b c a b c d e f"   # "a b" x3, "a b c" x3 of 10 trigram slots
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # default output unchanged (the driver-gated two-column form)
    d2 = repetition_stats(df).collect()[0]
    assert d2.asDict().keys() == {"doc_id", "dup_line_frac",
                                  "top_bigram_frac", "n_bigrams"}
    multi = repetition_stats(df, ns=(2, 3, 4)).collect()[0]
    assert multi.top_bigram_frac == d2.top_bigram_frac
    assert multi.n_bigrams == d2.n_bigrams
    # python recompute for n=3 (grams built over slice windows 0..len-3)
    toks = text.split()
    tri = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 3 + 1)]
    from collections import Counter
    c = Counter(tri)
    assert multi.n_3grams == len(tri)
    assert multi.top_3gram_frac == round(max(c.values()) / len(tri), 6)
    assert multi.n_4grams == len(toks) - 4 + 1


def test_repetition_short_docs_have_no_phantom_grams(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b c")], "doc_id long, text string")
    got = {r.doc_id: r for r in
           repetition_stats(df, ns=(2, 4)).collect()}
    # 1-token and empty docs: no bigrams at all, never "100% repetitive"
    for i in (1, 2):
        assert got[i].n_bigrams == 0 and got[i].top_bigram_frac is None, i
    # 3-token doc has bigrams but no 4-grams
    assert got[3].n_bigrams == 2 and got[3].top_bigram_frac == 0.5
    assert got[3].n_4grams == 0 and got[3].top_4gram_frac is None
    # every input doc is present
    assert set(got) == {1, 2, 3}


def test_canonical_url_and_url_dedup(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        canonical_url,
        url_dedup,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "https://WWW.Example.com/a/b/?utm_source=x&id=2&utm_medium=y"),
        (2, "https://example.com/a/b?id=2"),             # same as 1
        (3, "HTTP://example.com:80/a/b/"),               # scheme+port+slash
        (4, "https://example.com/a/b?id=3"),             # different param value
        (5, "https://other.net/"),
        (6, "not a url at all"),
        (7, None),
        (8, "http://example.com:8080/a/b"),    # NON-default port kept
        (9, "https://example.com:8080/a/b"),   # 8080 not https-default
        (10, "https://example.com:443/a/b"),   # https default stripped
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    canon = {r.doc_id: r.c
             for r in df.select("doc_id",
                                canonical_url("url").alias("c")).collect()}
    assert canon[1] == canon[2] == "https://example.com/a/b?id=2"
    assert canon[3] == "http://example.com/a/b"
    assert canon[4] == "https://example.com/a/b?id=3"
    assert canon[5] == "https://other.net"
    assert canon[7] is None
    # ports: scheme-matching default dropped, any other port is part of
    # the origin and must NOT merge with the port-less form (ADVICE r3)
    assert canon[8] == "http://example.com:8080/a/b"
    assert canon[9] == "https://example.com:8080/a/b"
    assert canon[8] != canon[3] and canon[8] != canon[9]
    assert canon[10] == "https://example.com/a/b"

    out = url_dedup(df).collect()
    by_url = {r.canonical_url: r for r in out if r.canonical_url is not None}
    assert by_url["https://example.com/a/b?id=2"].kept_id == 1
    assert by_url["https://example.com/a/b?id=2"].n_copies == 2
    # every doc is represented exactly once across keepers+copies
    assert sum(r.n_copies for r in out) == len(rows)
    assert by_url["http://example.com:8080/a/b"].n_copies == 1
    # unparseable/null URLs never merge
    nulls = [r for r in out if r.canonical_url is None]
    assert sorted(r.kept_id for r in nulls) == [6, 7] or \
        sorted(r.kept_id for r in nulls) == [6]  # "not a url" may parse


def test_compression_ratio_signal(spark):
    """zlib ratio separates repetitive text (compresses hard) from
    prose from incompressible noise; python-recompute parity."""
    import zlib

    from apsviz_timeseriesdb_ingest_spark.llm.text import compression_ratio

    import random
    rng = random.Random(7)
    noise = "".join(chr(rng.randint(33, 126)) for _ in range(400))
    rows = [
        (1, "spam " * 200),
        (2, "the quiet morning river carries small boats past the old "
            "mill while children watch from the stone bridge above " * 4),
        (3, noise),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df).collect()}

    for doc_id, text in rows:
        if text:
            b = text.encode()
            assert out[doc_id].n_bytes == len(b)
            assert out[doc_id].compression_ratio == round(
                len(zlib.compress(b, 6)) / len(b), 6)
    assert out[1].compression_ratio < 0.1            # repetition collapses
    assert 0.1 < out[2].compression_ratio < 0.7      # prose in between
    assert out[3].compression_ratio > 0.8            # noise won't compress
    assert out[4].compression_ratio is None
    assert out[5].compression_ratio is None


def test_blocked_terms_and_c4_line_filter(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        blocked_terms_expr,
        c4_line_filter,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a perfectly ordinary sentence about gardens."),
         (2, "this text mentions JACKPOT winnings right here."),
         (3, "jackpots are not the word jackpot is."),  # whole-token only
         (4, None)],
        "doc_id long, text string")
    flags = {r.doc_id: r.f for r in docs.select(
        "doc_id", blocked_terms_expr(("jackpot", "casino"))
        .alias("f")).collect()}
    assert flags[1] is False
    assert flags[2] is True       # case-insensitive via tokenizer
    assert flags[3] is True       # 'jackpot' appears as its own token
    assert not flags[4]           # null text never flags

    text = ("Welcome to our site.\n"
            "Home | About | Contact\n"
            "Cookies settings\n"
            "This is a real paragraph of prose that ends properly.\n"
            "short line\n"
            'He said "stop right there!"\n'
            "Trailing words without punctuation ending here")
    out = c4_line_filter(spark.createDataFrame(
        [(1, text)], "doc_id long, text string")).collect()[0]
    kept = out.filtered_text.split("\n")
    assert kept == ["Welcome to our site.",
                    "This is a real paragraph of prose that ends properly.",
                    'He said "stop right there!"']
    assert out.n_lines == 7 and out.n_removed == 4

    # min_words only (no terminal requirement)
    loose = c4_line_filter(spark.createDataFrame(
        [(1, text)], "doc_id long, text string"),
        require_terminal=False).collect()[0]
    assert "Trailing words without punctuation ending here" \
        in loose.filtered_text
    assert "short line" not in loose.filtered_text


def test_canonical_url_properties(spark):
    """Property sweep for the r4 port-handling fix: idempotence
    (canonicalizing a canonical form is a fixpoint), tracking-param
    removal with order-insensitivity, and the port rules over the
    scheme x port grid."""
    from itertools import product

    from apsviz_timeseriesdb_ingest_spark.llm.text import canonical_url
    from pyspark.sql import functions as F

    urls = []
    for scheme, port in product(("http", "https"),
                                ("", ":80", ":443", ":8080")):
        urls.append(f"{scheme}://Host.Example{port}/Path/?b=2&utm_x=1&a=1")
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    canon = {r.url: r.c for r in df.select(
        "url", canonical_url("url").alias("c")).collect()}

    # scheme-matching default dropped; mismatched/default-free kept
    assert canon["http://Host.Example:80/Path/?b=2&utm_x=1&a=1"] == \
        canon["http://Host.Example/Path/?b=2&utm_x=1&a=1"]
    assert canon["https://Host.Example:443/Path/?b=2&utm_x=1&a=1"] == \
        canon["https://Host.Example/Path/?b=2&utm_x=1&a=1"]
    assert ":8080" in canon["http://Host.Example:8080/Path/?b=2&utm_x=1&a=1"]
    assert ":443" in canon["http://Host.Example:443/Path/?b=2&utm_x=1&a=1"]
    assert ":80" in canon["https://Host.Example:80/Path/?b=2&utm_x=1&a=1"]
    # params sorted, tracking stripped, host lowercased
    for c in canon.values():
        assert c.endswith("/Path?a=1&b=2")
        assert "host.example" in c and "utm" not in c

    # idempotence: canonical forms are fixpoints
    cdf = spark.createDataFrame([(i, c) for i, c in
                                 enumerate(set(canon.values()))],
                                "doc_id long, url string")
    again = {r.url: r.c for r in cdf.select(
        "url", canonical_url("url").alias("c")).collect()}
    assert all(k == v for k, v in again.items())

    # param-order insensitivity
    pair = spark.createDataFrame(
        [(1, "https://x.example/p?z=1&a=2"),
         (2, "https://x.example/p?a=2&z=1")], "doc_id long, url string")
    got = [r.c for r in pair.select(canonical_url("url").alias("c"))
           .collect()]
    assert got[0] == got[1]


def test_order_buckets_invariance_and_adaptive_default(spark):
    """r10: the two-phase enumeration's bucket count is a parallelism
    knob ONLY — shuffle_pos / pack_id / running totals are identical
    at any order_buckets (the top key bits split one fixed total
    order), and the default scales with the cluster instead of the
    old fixed 64 (which capped a 10^10-row enumeration at 64-way
    parallelism)."""
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        _MAX_ORDER_BUCKETS,
        N_ORDER_BUCKETS,
        _order_bucket_bits,
        shuffle_rank,
    )

    rows = [(i, "x" * (7 * (i % 13) + 1), 2 * i) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tok int")
    base = {(r.doc_id, r.shuffle_pos)
            for r in shuffle_rank(df, order_buckets=64).collect()}
    for ob in (1, 16, 1024):
        got = {(r.doc_id, r.shuffle_pos)
               for r in shuffle_rank(df, order_buckets=ob).collect()}
        assert got == base, ob
    p64 = {(r.doc_id, r.pack_id, r.shuffle_pos) for r in pack_documents(
        df, weight_col="n_tok", target_chars=40,
        order_buckets=64).collect()}
    p1k = {(r.doc_id, r.pack_id, r.shuffle_pos) for r in pack_documents(
        df, weight_col="n_tok", target_chars=40,
        order_buckets=1024).collect()}
    assert p64 == p1k

    # adaptive default: 2 windows per slot, floored at the old 64,
    # capped at the literal-map ceiling
    par = spark.sparkContext.defaultParallelism
    bits = _order_bucket_bits(df, None)
    want = min(_MAX_ORDER_BUCKETS, max(N_ORDER_BUCKETS, par * 2))
    assert 2 ** bits >= want and 2 ** (bits - 1) < 2 * want
