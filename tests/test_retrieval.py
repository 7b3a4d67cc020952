"""BM25 top-k: DuckDB-recomputed ranking parity on the documents table
plus behavioral checks (self-retrieval, min_idf skew cap)."""

from __future__ import annotations

import duckdb

from apsviz_timeseriesdb_ingest_spark.llm.retrieval import bm25_topk
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _duck_bm25(sf_dir: str, query_rows, top_k=10, k1=1.2, b=0.75):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in query_rows)
    sql = f"""
        WITH lens AS (
            SELECT doc_id, {TOKS} AS tk, len({TOKS}) AS dl FROM documents),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
        tf AS (SELECT doc_id, dl, term, count(*) AS tf
               FROM (SELECT doc_id, dl, unnest(tk) AS term FROM lens)
               GROUP BY doc_id, dl, term),
        idf AS (SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf
                FROM (SELECT term, count(*) AS df FROM tf GROUP BY term),
                     stats),
        q(qid, term) AS (VALUES {qvals}),
        contrib AS (
            SELECT q.qid, tf.doc_id,
                   idf.idf * tf.tf * ({k1} + 1)
                   / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / stats.avgdl))
                   AS s
            FROM tf JOIN idf USING (term) JOIN q USING (term)
            CROSS JOIN stats),
        scored AS (SELECT qid, doc_id, round(sum(s), 6) AS bm25
                   FROM contrib GROUP BY qid, doc_id)
        SELECT qid, doc_id, bm25,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored QUALIFY rnk <= {top_k} ORDER BY qid, rnk
    """
    return con.execute(sql).fetchall()


def test_bm25_matches_duckdb_ranking(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    # query terms drawn from real corpus docs (so matches exist)
    sample = {r.doc_id: r.text for r in docs.orderBy("doc_id").limit(3).collect()}
    ids = sorted(sample)
    q_rows = []
    for qid, i in enumerate(ids):
        words = [w for w in sample[i].lower().split() if w.isalpha()][:4]
        q_rows.extend((qid, w) for w in dict.fromkeys(words))
    queries = spark.createDataFrame(
        [(qid, " ".join(w for q, w in q_rows if q == qid))
         for qid in {q for q, _ in q_rows}],
        "query_id long, text string")

    got = [(r.query_id, r.doc_id, r.bm25, r.rnk)
           for r in bm25_topk(docs, queries, top_k=10)
           .orderBy("query_id", "rnk").collect()]
    expect = _duck_bm25(sf_oracle, q_rows)
    assert [(q, d, k) for q, d, _, k in got] \
        == [(q, d, k) for q, d, _, k in expect]
    for (_, _, s1, _), (_, _, s2, _) in zip(got, expect):
        assert abs(s1 - s2) < 1e-4


def test_bm25_self_retrieval_and_min_idf(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    probe = docs.orderBy("doc_id").limit(1).collect()[0]
    queries = spark.createDataFrame([(0, probe.text)],
                                    "query_id long, text string")
    # the doc retrieves itself among the top hits (exact top-1 is not
    # guaranteed under BM25 length normalization when the synthetic
    # corpus plants near-duplicates of the probe)
    top = {r.doc_id for r in bm25_topk(docs, queries, top_k=5).collect()}
    assert probe.doc_id in top

    # min_idf only drops near-zero stopword contributions: the self
    # match survives the cap
    capped = {r.doc_id for r in
              bm25_topk(docs, queries, top_k=5, min_idf=0.05).collect()}
    assert probe.doc_id in capped


def test_bm25_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame([(0, "anything")],
                                    "query_id long, text string")
    assert bm25_topk(empty, queries).count() == 0


def test_contamination_report_ranks_planted_overlap(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        contamination_report,
    )

    bench_text = ("what is the capital of france and the answer "
                  "is paris of course my friend")
    corpus_rows = [
        # verbatim-span contaminated doc
        (1, "prefix words " + bench_text + " suffix words"),
        # topically related but low overlap
        (2, "the capital city has many answers about france and travel"),
        # unrelated
        (3, "numpy arrays and spark dataframes process tokens quickly"),
        (4, "gardening tips for growing tomatoes in small spaces daily"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    rep = sorted(contamination_report(corpus, bench, top_k=3).collect(),
                 key=lambda r: r.rnk)
    assert rep[0].doc_id == 1 and rep[0].bench_id == 100

    # python recompute of the planted pair's 3-gram jaccard
    def sh(text):
        t = text.lower().split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    a, b = sh(corpus_rows[0][1]), sh(bench_text)
    expect_j = round(len(a & b) / len(a | b), 6)
    assert rep[0].jaccard == expect_j
    assert rep[0].overlap_shingles == len(a & b)
    # weaker matches rank below and overlap less
    assert all(r.jaccard < expect_j for r in rep[1:])


def test_bm25_precomputed_stats_and_string_id_schema(spark):
    rows = [("a", "the cat sat on the mat"), ("b", "a dog ran fast today")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    queries = spark.createDataFrame([("q1", "cat mat")],
                                    "query_id string, text string")
    auto = bm25_topk(docs, queries, top_k=2).collect()
    # precomputed stats reproduce the same scores (6 + 5 tokens)
    pre = bm25_topk(docs, queries, top_k=2, n_docs=2, avgdl=11 / 2).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pre))
    assert auto[0].doc_id == "a"

    # empty corpus preserves the caller's id types (string, not long)
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = bm25_topk(empty, queries)
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["query_id"] == "string"


def test_bm25_index_probe_matches_direct(spark, sf_small, tmp_path):
    """The persisted-index probe ends in the same scoring tail as the
    direct path — rows must be identical, and the pruned tf scan must
    show a term_bucket partition filter."""
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    docs = load_table(spark, sf_small, "documents")
    sample = docs.orderBy("doc_id").limit(2).collect()
    queries = spark.createDataFrame(
        [(i, " ".join(r.text.lower().split()[:6]))
         for i, r in enumerate(sample)], "query_id long, text string")

    catalog = Catalog(spark, str(tmp_path / "wh"))
    build_bm25_index(catalog, docs)
    probe = bm25_topk_from_index(catalog, queries, top_k=7)
    direct = bm25_topk(docs, queries, top_k=7)
    got = sorted(map(tuple, probe.collect()))
    exp = sorted(map(tuple, direct.collect()))
    assert got == exp and got

    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "term_bucket" in plan and "PartitionFilters: [" in plan


def test_bm25_index_incremental_append(spark, sf_small, tmp_path):
    """Log-structured stats: building on half the corpus then appending
    the other half probes identically to one full build (df/stats sum
    per term; no read-modify-write)."""
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    queries = spark.createDataFrame(
        [(0, " ".join(docs.orderBy("doc_id").limit(1)
                      .collect()[0].text.lower().split()[:6]))],
        "query_id long, text string")

    catalog = Catalog(spark, str(tmp_path / "inc"))
    build_bm25_index(catalog, first)
    build_bm25_index(catalog, second, append=True)
    full = Catalog(spark, str(tmp_path / "full"))
    build_bm25_index(full, docs)

    got = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    exp = sorted(map(tuple, bm25_topk_from_index(full, queries).collect()))
    assert got == exp and got


def test_rrf_fuse_matches_python_recompute(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
        "query_id long, doc_id long, rnk int")
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (1, 20, 1), (1, 21, 2)],
        "query_id long, doc_id long, rnk int")
    got = {(r.query_id, r.doc_id): (r.rrf, r.n_systems, r.rnk)
           for r in rrf_fuse([lex, dense], k=60, top_k=10).collect()}

    scores: dict = {}
    for rows in ([(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
                 [(0, 11, 1), (0, 13, 2), (1, 20, 1), (1, 21, 2)]):
        for q, d, r in rows:
            s, n = scores.get((q, d), (0.0, 0))
            scores[(q, d)] = (s + 1.0 / (60 + r), n + 1)
    for q in (0, 1):
        ranked = sorted(((d, v) for (qq, d), v in scores.items() if qq == q),
                        key=lambda x: (-round(x[1][0], 9), x[0]))
        for rnk, (d, (s, n)) in enumerate(ranked, start=1):
            assert got[(q, d)] == (round(s, 9), n, rnk)
    # doc 11 (in both systems) outranks every single-system doc for q0
    assert got[(0, 11)][2] == 1


def test_hybrid_retrieval_composes_on_testdata(spark, sf_small):
    """Lexical BM25 + dense hash-embedding rankings fuse end-to-end:
    deterministic across runs, and the fused winner is a doc BOTH
    systems retrieved (the testdata plants near-dups of the probe;
    brute_force_topk excludes the self-match, so the winner is a
    near-dup, not the probe itself)."""
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import rrf_fuse
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        brute_force_topk,
        hash_embedding,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    probe = docs.orderBy("doc_id").limit(1).collect()[0]
    queries = spark.createDataFrame([(int(probe.doc_id), probe.text)],
                                    "query_id long, text string")
    lex = bm25_topk(docs, queries, top_k=5)
    dense = (brute_force_topk(hash_embedding(docs),
                              id_col="doc_id", query_ids=[int(probe.doc_id)],
                              top_k=5)
             .select("query_id", F.col("neighbor_id").alias("doc_id"),
                     F.col("rank").alias("rnk")))
    fused1 = sorted(map(tuple, rrf_fuse([lex, dense], top_k=5).collect()))
    fused2 = sorted(map(tuple, rrf_fuse([lex, dense], top_k=5).collect()))
    assert fused1 == fused2 and fused1
    # lexical self-retrieval keeps the probe in the fused set ...
    assert probe.doc_id in {t[1] for t in fused1}
    # ... but the winner is a two-system consensus doc: rrf's point
    top = min(fused1, key=lambda t: t[4])
    assert top[3] == 2  # n_systems


def test_ranking_recall_at_k(spark):
    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        ranking_recall_at_k,
    )

    truth = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 9, 1), (2, 5, 1), (0, 4, 4)],
        "query_id long, doc_id long, rnk int")
    got = spark.createDataFrame(
        [(0, 2, 1), (0, 7, 2), (0, 3, 3), (1, 8, 1), (3, 1, 1)],
        "query_id long, doc_id long, rnk int")
    out = {r.query_id: (r.n_true, r.n_hit, r.recall)
           for r in ranking_recall_at_k(got, truth, k=3).collect()}
    assert out[0] == (3, 2, round(2 / 3, 6))  # truth rnk 4 ignored at k=3
    assert out[1] == (1, 0, 0.0)
    assert out[2] == (1, 0, 0.0)   # query missing from got scores 0
    assert 3 not in out            # no truth -> dropped

    # self-comparison on a real ranking = perfect recall
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    probe = docs.orderBy("doc_id").limit(1).collect()[0]
    queries = spark.createDataFrame([(0, probe.text)],
                                    "query_id long, text string")
    rank = bm25_topk(docs, queries, top_k=5)
    perfect = ranking_recall_at_k(rank, rank, k=5).collect()
    assert all(r.recall == 1.0 for r in perfect) and perfect


def test_bm25_index_ledger_gated_append_idempotent(spark, tmp_path):
    """The documented append discipline, executably: batch appends to
    the BM25 index gated by the ingest ledger anti-join — replaying an
    already-indexed batch is a no-op, so probes stay correct under
    at-least-once delivery."""
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.operators.ledger import (
        new_files_anti_join,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "batch", F.lit("batch-1"))
    b2 = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "batch", F.lit("batch-2"))
    catalog = Catalog(spark, str(tmp_path / "wh"))
    ledger_t = "bm25_ingest_ledger"

    def ingest(batch):
        ledger = (catalog.read(ledger_t, batch.select("batch").schema)
                  if catalog.exists(ledger_t)
                  else spark.createDataFrame([], "batch string"))
        fresh = new_files_anti_join(batch, ledger, file_col="batch")
        if fresh.take(1):
            build_bm25_index(catalog, fresh.drop("batch"),
                             append=catalog.exists("bm25_tf"))
            catalog.append(fresh.select("batch").distinct(), ledger_t)

    ingest(b1)
    ingest(b2)
    ingest(b1)  # replay: ledger-gated, must not double-count
    ingest(b2)

    queries = spark.createDataFrame(
        [(0, " ".join(docs.orderBy("doc_id").limit(1)
                      .collect()[0].text.lower().split()[:6]))],
        "query_id long, text string")
    got = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    exp = sorted(map(tuple, bm25_topk(docs, queries).collect()))
    assert got == exp and got


def test_bm25_txn_append_crash_replay(spark, sf_small, tmp_path):
    """Commit-ledger protocol on the lexical index (r4): a crash after
    the tf write but before df/stats leaves the index OBSERVABLY
    unchanged (probes read committed batches only — no torn
    tf-without-df state), the replay replaces the partial partitions
    and commits, and the recovered index probes bit-identical to a
    one-shot full build. Replay of a committed batch is a no-op; a
    legacy flat index is refused."""
    import pytest
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        append_bm25_increment_txn,
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    docs = load_table(spark, sf_small, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    queries = spark.createDataFrame(
        [(0, " ".join(docs.orderBy("doc_id").limit(1)
                      .collect()[0].text.lower().split()[:6]))],
        "query_id long, text string")

    catalog = Catalog(spark, str(tmp_path / "txn"))
    build_bm25_index(catalog, first, txn=True)
    before = sorted(map(tuple,
                        bm25_topk_from_index(catalog, queries).collect()))

    class _CrashAfterTf:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            return getattr(self._real, name)

        def overwrite(self, df, table, *, partition_by=()):
            self._real.overwrite(df, table, partition_by=partition_by)
            if table.endswith("_tf"):
                raise RuntimeError("simulated crash after tf write")

    with pytest.raises(RuntimeError, match="simulated crash"):
        append_bm25_increment_txn(_CrashAfterTf(catalog), second, 5)
    # torn state is invisible: probe sees exactly the committed index
    mid = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    assert mid == before
    # uncommitted tf rows ARE on disk (the crash was real) ...
    assert catalog.read("bm25_tf").filter(F.col("__batch") == 5).count() > 0
    # ... but the ledger lacks the batch
    assert not catalog.batch_committed("bm25_commits", 5)

    # replay: replaces the partial partitions, commits, and the index
    # now equals a one-shot full build bit-for-bit
    append_bm25_increment_txn(catalog, second, 5)
    full = Catalog(spark, str(tmp_path / "full"))
    build_bm25_index(full, docs)
    got = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    exp = sorted(map(tuple, bm25_topk_from_index(full, queries).collect()))
    assert got == exp and got

    # committed replay is a no-op (no duplicate counts)
    append_bm25_increment_txn(catalog, second, 5)
    assert sorted(map(tuple, bm25_topk_from_index(catalog, queries)
                      .collect())) == exp
    assert catalog.batch_committed("bm25_commits", 5)

    legacy = Catalog(spark, str(tmp_path / "legacy"))
    build_bm25_index(legacy, first)
    with pytest.raises(ValueError, match="txn=True"):
        append_bm25_increment_txn(legacy, second, 1)
    with pytest.raises(ValueError, match="append_bm25_increment_txn"):
        build_bm25_index(legacy, second, append=True, txn=True)


def test_bm25_rebuild_replaces_stale_partitions(spark, sf_small, tmp_path):
    """Rebuilding a BM25 index over an existing generation must fully
    REPLACE it: the partitioned overwrites run under dynamic
    partitionOverwriteMode, so without the pre-drop a committed
    __batch=5 partition (txn layout) or term_buckets absent from the
    smaller rebuild corpus (legacy layout) survive as phantom rows
    that double-count into scores (ADVICE r4, medium)."""
    import os

    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        append_bm25_increment_txn,
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    docs = load_table(spark, sf_small, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    queries = spark.createDataFrame(
        [(0, " ".join(docs.orderBy("doc_id").limit(1)
                      .collect()[0].text.lower().split()[:6]))],
        "query_id long, text string")

    catalog = Catalog(spark, str(tmp_path / "wh"))
    build_bm25_index(catalog, first, txn=True)
    append_bm25_increment_txn(catalog, second, 5)

    # rebuild txn over the live two-batch index from the SMALLER corpus
    build_bm25_index(catalog, first, txn=True)
    for t in ("bm25_tf", "bm25_df", "bm25_stats"):
        batches = {d for d in os.listdir(catalog.path(t))
                   if d.startswith("__batch=")}
        assert batches == {"__batch=-1"}, t
    assert catalog.committed_batches("bm25_commits") == [(-1, "-")]
    # probe scores match the direct path over ONLY the rebuilt corpus
    # (phantom rows would shift N, avgdl, df and every score)
    got = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    want = sorted(map(tuple, bm25_topk(first, queries).collect()))
    assert got == want

    # legacy flat rebuild over the txn generation: __batch layout and
    # stale ledger retired, scores again match the direct path
    build_bm25_index(catalog, second)
    assert not catalog.exists("bm25_commits")
    assert "__batch" not in catalog.read("bm25_tf").columns
    got = sorted(map(tuple,
                     bm25_topk_from_index(catalog, queries).collect()))
    want = sorted(map(tuple, bm25_topk(second, queries).collect()))
    assert got == want


def test_bm25_failed_rebuild_keeps_old_generation(spark, sf_small,
                                                  tmp_path, monkeypatch):
    """A BM25 rebuild that fails mid-job must leave the OLD index
    generation readable and probe-able (ADVICE r5: drop-then-write left
    no index at all on any rebuild failure)."""
    import os

    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        bm25_topk_from_index,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    docs = load_table(spark, sf_small, "documents")
    queries = spark.createDataFrame(
        [(0, " ".join(docs.orderBy("doc_id").limit(1)
                      .collect()[0].text.lower().split()[:6]))],
        "query_id long, text string")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    build_bm25_index(catalog, docs, txn=True)
    before = sorted(map(tuple,
                        bm25_topk_from_index(catalog, queries).collect()))

    real_overwrite = Catalog.overwrite
    calls = {"n": 0}

    def failing_overwrite(self, df, table, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # fail after the first staged table lands
            raise RuntimeError("injected rebuild failure")
        return real_overwrite(self, df, table, **kw)

    monkeypatch.setattr(Catalog, "overwrite", failing_overwrite)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="injected"):
        build_bm25_index(catalog,
                         docs.filter(F.col("doc_id") % 2 == 0), txn=True)
    monkeypatch.undo()

    after = sorted(map(tuple,
                       bm25_topk_from_index(catalog, queries).collect()))
    assert after == before
    assert not any(t.endswith("__staging")
                   for t in os.listdir(catalog.warehouse))


def test_bm25_concurrent_writer_fencing(spark, sf_small, tmp_path):
    """Writer-generation fencing on the BM25 commit-ledger index: the
    second acquirer fences the first, whose next transactional append
    raises instead of silently interleaving batches."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        append_bm25_increment_txn,
        build_bm25_index,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import (
        Catalog, ConcurrentWriterError, WriterLease)

    docs = load_table(spark, sf_small, "documents")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    build_bm25_index(catalog, docs.filter(F.col("doc_id") < 20), txn=True)

    a = WriterLease(catalog, "bm25").acquire(spark)
    append_bm25_increment_txn(
        catalog, docs.filter((F.col("doc_id") >= 20)
                             & (F.col("doc_id") < 30)), 1, lease=a)
    b = WriterLease(catalog, "bm25").acquire(spark)
    before = len(catalog.committed_batches("bm25_commits"))
    with _pytest.raises(ConcurrentWriterError, match="fenced"):
        append_bm25_increment_txn(
            catalog, docs.filter((F.col("doc_id") >= 30)
                                 & (F.col("doc_id") < 40)), 2, lease=a)
    assert len(catalog.committed_batches("bm25_commits")) == before
    # committed-batch replays stay no-ops even when fenced
    append_bm25_increment_txn(
        catalog, docs.filter((F.col("doc_id") >= 20)
                             & (F.col("doc_id") < 30)), 1, lease=a)
    # writer B proceeds normally
    append_bm25_increment_txn(
        catalog, docs.filter((F.col("doc_id") >= 30)
                             & (F.col("doc_id") < 40)), 2, lease=b)
    # a rebuild retires the lease table -> both writers fail loudly
    build_bm25_index(catalog, docs.filter(F.col("doc_id") < 20), txn=True)
    with _pytest.raises(ConcurrentWriterError, match="gone"):
        append_bm25_increment_txn(
            catalog, docs.filter(F.col("doc_id") >= 40), 3, lease=b)
