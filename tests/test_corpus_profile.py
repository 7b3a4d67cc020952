"""corpus_profile / language_mix: DuckDB-recomputed parity on the
documents table (same pattern as the j7 keep-latest pytest oracle) plus
behavioral checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.text import (
    DEFAULT_LANG_PROFILES,
    corpus_profile,
    language_mix,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table
from tests.oracle_harness import compare, duckdb_conn

SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

PROFILE_SQL = f"""
    WITH base AS (SELECT source, len({SQL_TOKS}) AS n_tokens,
                         length(text) AS n_chars FROM documents)
    SELECT source,
           count(*) AS n_docs,
           sum(n_tokens) AS total_tokens,
           round(avg(n_tokens), 6) AS avg_tokens,
           round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
           round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
           round(quantile_cont(n_tokens, 0.99), 6) AS p99_tokens,
           sum(n_chars) AS total_chars
    FROM base GROUP BY source
"""


def _mix_sql() -> str:
    langs = sorted(DEFAULT_LANG_PROFILES)
    score_exprs = ", ".join(
        "len(list_filter(ts, t -> t IN ({}))) AS score_{}".format(
            ", ".join(f"'{m}'" for m in DEFAULT_LANG_PROFILES[lang]), lang)
        for lang in langs)
    case = "CASE "
    for lang in langs:
        conds = " AND ".join(f"score_{lang} >= score_{o}"
                             for o in langs if o != lang)
        case += f"WHEN {conds} THEN '{lang}' "
    case += "END"
    return f"""
        WITH toks AS (SELECT source, {SQL_TOKS} AS ts FROM documents),
        scored AS (SELECT source, {score_exprs} FROM toks),
        pred AS (SELECT source, {case} AS predicted_lang FROM scored),
        counts AS (SELECT source, predicted_lang, count(*) AS n_docs
                   FROM pred GROUP BY source, predicted_lang)
        SELECT source, predicted_lang, n_docs,
               round(n_docs / sum(n_docs) OVER (PARTITION BY source), 6)
                   AS fraction
        FROM counts
    """


def test_corpus_profile_duckdb_parity(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = corpus_profile(docs)
    con = duckdb_conn(sf_oracle)
    compare(out, con, PROFILE_SQL, name="corpus_profile")


def test_language_mix_duckdb_parity(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = language_mix(docs)
    con = duckdb_conn(sf_oracle)
    compare(out, con, _mix_sql(), name="language_mix")


def test_language_mix_fractions_sum_to_one(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    sums = (language_mix(docs).groupBy("source")
            .agg(F.sum("fraction").alias("s")).collect())
    for r in sums:
        assert abs(r.s - 1.0) < 1e-4


def test_weighted_sample_duckdb_parity(spark, sf_oracle):
    from apsviz_timeseriesdb_ingest_spark.functions.portable_hash import (
        md5_hash64_sql,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.text import weighted_sample

    docs = load_table(spark, sf_oracle, "documents")
    out = weighted_sample(docs, rate=0.3).select("doc_id")
    h = md5_hash64_sql("doc_id", seed="sample-v1")
    sql = f"""
        SELECT doc_id FROM documents
        WHERE {h} / CAST(pow(2, 60) AS DOUBLE) < 0.3
    """
    compare(out, duckdb_conn(sf_oracle), sql, name="weighted_sample")


def test_weighted_sample_behavior(spark, sf_small):
    from apsviz_timeseriesdb_ingest_spark.llm.text import weighted_sample

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    kept = weighted_sample(docs, rate=0.5).count()
    assert 0.35 * n < kept < 0.65 * n  # ~rate, hash-uniform
    # deterministic: identical survivors across runs
    a = {r.doc_id for r in weighted_sample(docs, rate=0.5).collect()}
    b = {r.doc_id for r in weighted_sample(docs, rate=0.5).collect()}
    assert a == b
    # weight scales survival: weight 0 kills everything, 1.0 = unweighted
    w = docs.withColumn("wt", F.lit(0.0))
    assert weighted_sample(w, weight_col="wt", rate=0.9).count() == 0
    w1 = docs.withColumn("wt", F.lit(1.0))
    assert ({r.doc_id for r in
             weighted_sample(w1, weight_col="wt", rate=0.5).collect()} == a)


def test_corpus_profile_single_group(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "a b c d e", "s"), (3, "a", "s")],
        "doc_id long, text string, source string")
    row = corpus_profile(docs).collect()[0]
    assert (row.n_docs, row.total_tokens) == (3, 9)
    assert row.p50_tokens == 3.0


def test_stratified_sample_duckdb_parity(spark, sf_oracle):
    from apsviz_timeseriesdb_ingest_spark.functions.portable_hash import (
        md5_hash64_sql,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.text import stratified_sample

    docs = load_table(spark, sf_oracle, "documents")
    out = stratified_sample(docs, "source", 7).select("source", "doc_id")
    h = md5_hash64_sql("doc_id", seed="strata-v1")
    sql = f"""
        SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {h}, doc_id) AS rn
            FROM documents) WHERE rn <= 7
    """
    compare(out, duckdb_conn(sf_oracle), sql, name="stratified_sample")


def test_stratified_sample_behavior(spark, sf_small):
    from apsviz_timeseriesdb_ingest_spark.llm.text import stratified_sample

    docs = load_table(spark, sf_small, "documents")
    out = stratified_sample(docs, ["source"], 5)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_stratum = {r.source: r.n for r in
                   docs.groupBy("source").agg(F.count("*").alias("n"))
                   .collect()}
    for s, have in per_stratum.items():
        assert counts[s] == min(5, have)
    # deterministic: the same sample on a rerun
    a = {(r.source, r.doc_id) for r in out.collect()}
    b = {(r.source, r.doc_id)
         for r in stratified_sample(docs, ["source"], 5).collect()}
    assert a == b


def test_corpus_profile_approximate_close_to_exact(spark, sf_small):
    from apsviz_timeseriesdb_ingest_spark.llm.text import corpus_profile

    docs = load_table(spark, sf_small, "documents")
    exact = {r.source: r for r in corpus_profile(docs).collect()}
    approx = {r.source: r
              for r in corpus_profile(docs, approximate=True).collect()}
    assert set(exact) == set(approx)
    for s in exact:
        # identical exact aggregates, same schema
        assert approx[s].n_docs == exact[s].n_docs
        assert approx[s].total_tokens == exact[s].total_tokens
        # GK returns an actual data value (no interpolation), so allow
        # one value-step of slack around the interpolated exact number
        for c in ("p50_tokens", "p90_tokens", "p99_tokens"):
            assert abs(approx[s][c] - exact[s][c]) <= max(
                5.0, 0.05 * exact[s][c]), (s, c)


def test_composition_drift_js_divergence(spark):
    """Python-recomputed JS divergence; identical mixes score 0; a
    one-sided group carries the one-sided limit term."""
    import math

    from apsviz_timeseriesdb_ingest_spark.llm.text import composition_drift

    a = spark.createDataFrame(
        [(i, "web") for i in range(60)] + [(i + 100, "books") for i in range(30)]
        + [(i + 200, "code") for i in range(10)],
        "doc_id long, source string")
    b = spark.createDataFrame(
        [(i, "web") for i in range(40)] + [(i + 100, "books") for i in range(55)]
        + [(i + 300, "wiki") for i in range(5)],
        "doc_id long, source string")
    rows = {r.grp: r for r in composition_drift(a, b).collect()}
    assert set(rows) == {"web", "books", "code", "wiki"}
    assert rows["code"].n_b == 0 and rows["wiki"].n_a == 0
    assert rows["web"].frac_a == 0.6 and rows["web"].frac_b == 0.4

    # python recompute
    pa = {"web": .6, "books": .3, "code": .1, "wiki": 0.0}
    pb = {"web": .4, "books": .55, "code": 0.0, "wiki": .05}
    js = 0.0
    for g in pa:
        m = (pa[g] + pb[g]) / 2
        for p in (pa[g], pb[g]):
            if p > 0:
                js += p / 2 * math.log(p / m)
    got_js = sum(r.js_term for r in rows.values())
    assert abs(got_js - js) < 1e-8

    # identical corpora -> zero everywhere
    same = {r.grp: r for r in composition_drift(a, a).collect()}
    assert all(r.js_term == 0.0 and r.delta == 0.0 for r in same.values())
