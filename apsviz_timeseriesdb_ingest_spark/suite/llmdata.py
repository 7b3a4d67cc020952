"""Training-data pipeline operator suite (dedup, similarity search, text
analysis, multimodal) on the ``documents`` and ``embeddings`` testdata.

Every query has a DuckDB oracle built from the same deterministic
primitives (md5-derived hashing, RE2-compatible regexes, integer shifts)
so values match bit-for-bit. Shared SQL fragments live in module
constants; hyperplane coefficients are generated once in Python and
interpolated into both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from ..llm.multimodal import extract_media_features, with_binary_payload
from ..llm.similarity import (
    brute_force_topk,
    hyperplane_coefficients,
)
from ..llm.text import (
    DEFAULT_LANG_PROFILES,
    document_fingerprint,
    language_id,
)
from ._registry import make_registry, tables

QUERIES, ORACLES, query = make_registry()

#: DuckDB twin of llm.text.tokens
SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

#: DuckDB twin of llm.dedup.word_shingles (k=3); the list_filter mirrors
#: the empty-shingle guard in shingles_from_tokens (zero-token docs)
SQL_SHINGLES = ("list_filter(list_distinct([array_to_string(ts[i:i+2], ' ') "
                "FOR i IN generate_series(1, greatest(len(ts)-2, 1))]), "
                "x -> x <> '')")

def _md5int_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


SQL_SHINGLE_EXPLODE = f"""
    toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    shq AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks),
    ex AS (SELECT doc_id AS doc, {_md5int_sql('unnest(sh)')} AS shash FROM shq)
"""


def _terms_from_rows_sql(rows: list[list[float]]) -> str:
    """DuckDB sign-bucket expression over explicit hyperplane rows."""
    return " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(c) for c in row)}]) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, row in enumerate(rows))


def _hyperplane_terms_sql(dim: int, planes: int) -> str:
    """DuckDB expression for the sign-random-projection bucket of ``e``
    (the exact literal hyperplanes the Spark plan uses)."""
    return _terms_from_rows_sql(hyperplane_coefficients(dim=dim, planes=planes))


def _sparse_terms_sql(rows: list[list[float]]) -> str:
    """DuckDB sign-bucket expression over sparse hyperplane rows as
    EXPLICIT left-to-right term sums — textually the same order the
    Spark side expands (skipped zeros add exactly ±0.0, so both equal
    the full left-to-right dot bitwise)."""
    planes = []
    for p, row in enumerate(rows):
        terms = " + ".join(f"e[{i + 1}] * {c!r}"
                           for i, c in enumerate(row) if c != 0.0)
        planes.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(planes)


def _banded_buckets_sql(dim: int, planes: int, bands: int,
                        inv_density: int) -> str:
    """DuckDB list literal of the per-band sign buckets — band t uses
    hyperplanes [t*planes, (t+1)*planes) of the shared sparse family,
    exactly as ``llm.similarity.embedding_neardup_pairs`` slices them."""
    from ..llm.similarity import sparse_hyperplane_rows

    coeffs = sparse_hyperplane_rows(dim, bands * planes, inv_density)
    per_band = [
        f"CAST({_sparse_terms_sql(coeffs[t * planes:(t + 1) * planes])} AS BIGINT)"
        for t in range(bands)]
    return "[" + ", ".join(per_band) + "]"


# --- similarity / multimodal flagships -----------------------------------
# Registered FIRST among the LLM queries: the driver evaluates at most 50
# queries per round in registration order, and these two were the ones
# silently dropped in r1 (52 registered, rows 51-52 missing).

#: banded multi-table LSH geometry for the near-dup flagship: 12 bands x
#: 8 SPARSE ±1 planes (1/8 density — Achlioptas/very-sparse random
#: projections; dots are short codegen sums, not interpreted folds).
#: 8 planes/band = 256 buckets per table (vs 16 for r2's single 4-plane
#: table — the "too-coarse key" verdict); 12 bands recover recall via
#: the union of per-band collisions. Measured on the sf0.01 embeddings:
#: ~1.8x the recall of the dense single-table form at FEWER candidates
#: (0.305 vs 0.169 recall, 5.4% vs 7.1% of all pairs) — see
#: test_banded_lsh_beats_single_table.
_NEARDUP_PLANES = 8
_NEARDUP_BANDS = 12
_NEARDUP_INV_DENSITY = 8

@query("llm_embedding_neardup", sql=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e, {_banded_buckets_sql(64, _NEARDUP_PLANES, _NEARDUP_BANDS,
                                                 _NEARDUP_INV_DENSITY)}
          AS bks FROM v),
    bk AS (SELECT vec_id,
           unnest(generate_series(0, {_NEARDUP_BANDS - 1})) AS band,
           unnest(bks) AS bucket FROM b),
    cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
             FROM bk a JOIN bk b
             ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    s AS (SELECT va AS vec_id_a, vb AS vec_id_b,
          round(list_dot_product(x.e, y.e)
                / (sqrt(list_dot_product(x.e, x.e))
                   * sqrt(list_dot_product(y.e, y.e))), 6) AS sim
          FROM cand JOIN v x ON va = x.vec_id JOIN v y ON vb = y.vec_id)
    SELECT vec_id_a, vec_id_b, sim FROM s WHERE sim >= 0.4
""")
def llm_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via banded multi-table LSH
    (12 bands x 8 sparse ±1 planes): candidates = union of per-band
    bucket equi-joins, verified by exact cosine on candidates only — no
    driver collect, no O(n^2) scan, bucketing fully inside whole-stage
    codegen. The exact blas scan remains the small-corpus verifier
    (``tests/test_llm_ops.py``)."""
    from ..llm.similarity import embedding_neardup_pairs
    return embedding_neardup_pairs(tables(spark, sf_dir, "embeddings"),
                                   threshold=0.4, dim=64,
                                   planes=_NEARDUP_PLANES,
                                   bands=_NEARDUP_BANDS,
                                   inv_density=_NEARDUP_INV_DENSITY)


@query("llm_multimodal_features", sql="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height,
           CAST(NULL AS VARCHAR) AS mode,
           'stub-v1' AS decoder
    FROM documents
""")
def llm_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction through the real mapInPandas
    plumbing (Arrow batches, explicit schema); the layered decoder
    (PIL → header parse → stub) lands on the deterministic stub for
    these text payloads, keeping the row oracle-verifiable — real image
    bytes take the real branches (``test_multimodal_decode``)."""
    docs = with_binary_payload(tables(spark, sf_dir, "documents"))
    return extract_media_features(docs)


# --- text analysis -------------------------------------------------------

@query("llm_token_stats", sql=f"""
    WITH t AS (SELECT doc_id, text, length(text) AS n_chars_measured, {SQL_TOKS} AS toks,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS sub
               FROM documents)
    SELECT doc_id, n_chars_measured, len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           len(sub) AS n_subword_tokens,
           round(length(regexp_replace(text, '\\s', '', 'g')) / len(toks), 6) AS mean_word_len,
           round(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is'], x)))
                 / len(toks), 6) AS stopword_ratio,
           round(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) / length(text), 6)
               AS punct_ratio,
           round(1 - len(list_distinct(toks)) / len(toks), 6) AS repetition_ratio
    FROM t
""")
def llm_token_stats(spark, sf_dir):
    """Token counting + quality signals in one pass (token_stats ∪
    quality_score columns; the operators remain separately callable —
    folded into one gate query for the 50-query driver cap). Pure codegen
    expressions over one materialized token array."""
    from ..llm.text import text_stats
    return text_stats(tables(spark, sf_dir, "documents"))


@query("llm_pii_scrub", sql="""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
               '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed_text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ipv4,
           len(regexp_extract_all(text,
               '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]')) AS n_phone
    FROM documents
""")
def llm_pii_scrub(spark, sf_dir):
    """PII redaction: emails / IPv4s / phone runs masked with typed
    placeholders + per-class match counts — the standard pre-training
    scrub, RE2-safe regexes, all codegen."""
    from ..llm.text import scrub_pii
    return scrub_pii(tables(spark, sf_dir, "documents"))


@query("llm_repetition", sql=f"""
    WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS ts FROM documents),
    base AS (SELECT doc_id,
          round(CASE WHEN len(list_filter(string_split(text, chr(10)),
                                          x -> trim(x) <> '')) > 0
                THEN 1 - len(list_distinct(list_filter(string_split(text, chr(10)),
                                                       x -> trim(x) <> '')))
                     / len(list_filter(string_split(text, chr(10)), x -> trim(x) <> ''))
                ELSE 0.0 END, 6) AS dup_line_frac
          FROM t),
    b AS (SELECT doc_id,
          unnest([array_to_string(ts[i:i+1], ' ')
                  FOR i IN generate_series(1, len(ts)-1)]) AS bg
          FROM t WHERE len(ts) >= 2),
    c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1, 2),
    s AS (SELECT doc_id,
          round(max(cnt) / sum(cnt), 6) AS top_bigram_frac,
          CAST(sum(cnt) AS BIGINT) AS n_bigrams
          FROM c GROUP BY doc_id)
    SELECT base.doc_id, base.dup_line_frac, s.top_bigram_frac,
           COALESCE(s.n_bigrams, 0) AS n_bigrams
    FROM base LEFT JOIN s USING (doc_id)
""")
def llm_repetition(spark, sf_dir):
    """Gopher-style repetition signals: duplicate-line fraction (map-side)
    + top-bigram fraction (one explode, two partial aggs). Docs under
    n tokens report NULL fraction / 0 grams — no phantom truncated
    gram (oracle mirrors via the len >= 2 gate + left join)."""
    from ..llm.text import repetition_stats
    return repetition_stats(tables(spark, sf_dir, "documents"))


def _langid_sql() -> str:
    langs = sorted(DEFAULT_LANG_PROFILES)
    score_cols = ", ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{m}'" for m in DEFAULT_LANG_PROFILES[lang])
        + f"], x))) AS score_{lang}"
        for lang in langs)
    cases = " ".join(
        "WHEN " + " AND ".join(f"score_{lang} >= score_{o}" for o in langs if o != lang)
        + f" THEN '{lang}'"
        for lang in langs)
    return f"""
        WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {score_cols} FROM t)
        SELECT *, CASE {cases} END AS predicted_lang FROM s
    """


@query("llm_language_id", sql=_langid_sql())
def llm_language_id(spark, sf_dir):
    """Marker-token language ID with deterministic argmax tie-break."""
    return language_id(tables(spark, sf_dir, "documents"))


@query("llm_fingerprint", sql=f"""
    WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents)
    SELECT doc_id, md5(array_to_string(toks, ' ')) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS token_bag_md5,
           length(text) AS n_chars_measured
    FROM t
""")
def llm_fingerprint(spark, sf_dir):
    """Content + token-bag md5 fingerprints (reorder-robust)."""
    return document_fingerprint(tables(spark, sf_dir, "documents"))


# clean_text / train_split / vocabulary / length_buckets left the gate in
# r3 to make room under the driver's 50-query cap: cleaning stays gated
# through the same regexp_replace class as llm_pii_scrub, vocabulary
# through llm_tfidf_top_terms (same explode+count shape), and the
# split/bucket expressions are FOLDED into llm_gopher_stats below — the
# freed rows gate the newer corpus-prep operators (gopher signals,
# chunking, paragraph dedup, duplicate spans, BM25).

#: mixture rates for the gated per-doc signal suite (arbitrary but fixed;
#: exercises both the mapped-source and default-rate branches)
_MIXTURE_RATES = {"src0": 0.25, "src3": 0.75}

_SQL_CLEAN_LINE = "regexp_replace(lower(trim(ln)), '\\s+', ' ', 'g')"


@query("llm_gopher_stats", sql=f"""
    WITH t AS (SELECT doc_id, text, source, {SQL_TOKS} AS ts,
               list_filter(string_split_regex(text, '\\n'),
                           ln -> trim(ln) <> '') AS lns
               FROM documents),
    m AS (SELECT doc_id, text, source,
          len(ts) AS n_tok, len(lns) AS n_lines,
          list_sum(list_transform(ts, x -> length(x))) AS word_chars,
          (length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', ''))) / 3 AS n_sym,
          len(list_filter(lns, ln -> regexp_matches(trim(ln), '^[-*•]')))
            AS bullets,
          len(list_filter(lns, ln -> regexp_matches(trim(ln), '(\\.\\.\\.|…)$')))
            AS ellipses,
          len(list_filter(ts, x -> regexp_matches(x, '[a-z]'))) AS alpha,
          len(list_intersect(list_distinct(ts),
              ['the', 'a', 'and', 'of', 'to', 'is'])) AS stop_hits,
          {_md5int_sql("'split-v1|' || doc_id::VARCHAR")} % 100 AS split_bucket,
          {_md5int_sql("'mixture-v1|' || doc_id::VARCHAR")} / 1152921504606846976.0
              AS mix_u
          FROM t),
    s AS (SELECT doc_id,
          CAST(n_tok AS INT) AS n_tokens, CAST(n_lines AS INT) AS n_lines,
          CASE WHEN n_tok > 0 THEN round(word_chars / n_tok, 6) END
              AS mean_word_chars,
          CASE WHEN n_tok > 0 THEN round(n_sym / n_tok, 6) END
              AS symbol_word_ratio,
          CASE WHEN n_lines > 0 THEN round(bullets / n_lines, 6) END
              AS bullet_line_ratio,
          CASE WHEN n_lines > 0 THEN round(ellipses / n_lines, 6) END
              AS ellipsis_line_ratio,
          CASE WHEN n_tok > 0 THEN round(alpha / n_tok, 6) END
              AS alpha_word_ratio,
          CASE WHEN n_tok > 0 THEN CAST(stop_hits AS INT) END AS stop_hits,
          CAST(least(length(text) // 100, 8) AS INT) AS length_bucket,
          split_bucket,
          CASE WHEN split_bucket < 90 THEN 'train' ELSE 'eval' END AS split,
          mix_u < (CASE source WHEN 'src0' THEN 0.25
                   WHEN 'src3' THEN 0.75 ELSE 1.0 END) AS mixture_keep
          FROM m)
    SELECT *,
           CASE WHEN mean_word_chars < 3 OR mean_word_chars > 10
                    THEN 'word_length'
                WHEN symbol_word_ratio > 0.1 THEN 'symbol_ratio'
                WHEN bullet_line_ratio > 0.9 THEN 'bullet_lines'
                WHEN ellipsis_line_ratio > 0.3 THEN 'ellipsis_lines'
                WHEN alpha_word_ratio < 0.8 THEN 'non_alpha_words'
                WHEN stop_hits < 2 THEN 'no_stopwords'
           END AS drop_reason
    FROM s
""")
def llm_gopher_stats(spark, sf_dir):
    """Per-doc signal suite in ONE map-side projection: the Gopher
    rule-set quality ratios (Rae et al. 2021) + published-threshold drop
    reason, plus the other pure per-doc assignments folded in (length
    bucket for packing, deterministic train/eval hash split, mixture
    keep decision) — zero shuffles, zero Python."""
    from ..llm.text import (
        gopher_drop_reason,
        gopher_quality_stats,
        mixture_keep_expr,
        train_split_cols,
    )
    d = tables(spark, sf_dir, "documents")
    split_bucket, split = train_split_cols()
    return gopher_quality_stats(d, extra={
        "length_bucket": F.least(F.floor(F.length("text") / 100),
                                 F.lit(8)).cast("int"),
        "split_bucket": split_bucket,
        "split": split,
        "mixture_keep": mixture_keep_expr(_MIXTURE_RATES),
    }).withColumn("drop_reason", gopher_drop_reason())


@query("llm_chunk_documents", sql=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    n AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) >= 1),
    st AS (SELECT doc_id, ts,
           [s FOR s IN generate_series(1, greatest(n, 1), 48)
            IF s = 1 OR s + 16 <= n] AS starts FROM n),
    ch AS (SELECT doc_id,
           [{{'cid': i - 1, 'ck': ts[starts[i]:starts[i] + 63]}}
            FOR i IN generate_series(1, len(starts))] AS cl FROM st),
    u AS (SELECT doc_id, unnest(cl, recursive := true) FROM ch)
    SELECT doc_id, CAST(cid AS INT) AS chunk_id,
           array_to_string(ck, ' ') AS chunk_text,
           CAST(len(ck) AS INT) AS n_chunk_tokens
    FROM u
""")
def llm_chunk_documents(spark, sf_dir):
    """Token-aligned sliding-window chunking (64-token windows, 16-token
    overlap — small enough that sf0.01 docs actually split): the
    long-document → context-length stage, one map-side expansion."""
    from ..llm.text import chunk_documents
    return chunk_documents(tables(spark, sf_dir, "documents"),
                           max_tokens=64, overlap=16)


@query("llm_paragraph_dedup", sql=f"""
    WITH pl AS (SELECT doc_id,
                string_split_regex(text, '\\n[ \\t\\r]*\\n+') AS l
                FROM documents),
    px AS (SELECT doc_id, [{{'pos': i - 1, 'para': l[i]}}
           FOR i IN generate_series(1, len(l))] AS ps FROM pl),
    p AS (SELECT doc_id AS doc, unnest(ps, recursive := true) FROM px),
    pp AS (SELECT doc, pos, para,
           {_md5int_sql(_SQL_CLEAN_LINE.replace('ln', 'para'))} AS pkey
           FROM p WHERE trim(para) <> ''),
    st AS (SELECT doc, pos, para,
           count(*) OVER (PARTITION BY pkey) AS freq,
           row_number() OVER (PARTITION BY pkey ORDER BY doc, pos) AS rn
           FROM pp),
    fl AS (SELECT doc, pos, para, (freq > 1 AND rn <> 1) AS dropped FROM st),
    rb AS (SELECT doc,
           coalesce(string_agg(CASE WHEN NOT dropped THEN para END,
                               chr(10) || chr(10) ORDER BY pos), '')
               AS deduped_text,
           count(*) AS n_paragraphs,
           CAST(sum(CAST(dropped AS INT)) AS BIGINT) AS n_removed
           FROM fl GROUP BY doc)
    SELECT d.doc_id, coalesce(rb.deduped_text, '') AS deduped_text,
           coalesce(rb.n_paragraphs, 0) AS n_paragraphs,
           coalesce(rb.n_removed, 0) AS n_removed
    FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc
""")
def llm_paragraph_dedup(spark, sf_dir):
    """Corpus-wide paragraph dedup (RefinedWeb boilerplate pass):
    normalized-paragraph keep-first with deterministic winners; every
    input doc preserved (tag-don't-filter)."""
    from ..llm.spans import dedup_paragraphs
    return dedup_paragraphs(tables(spark, sf_dir, "documents"))


@query("llm_duplicate_spans", sql=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    lst AS (SELECT doc_id, [{{'pos': i - 1,
            'sh': array_to_string(ts[i:i+2], ' ')}}
            FOR i IN generate_series(1, greatest(len(ts) - 2, 1))] AS l
            FROM toks),
    pos AS (SELECT doc_id AS doc, unnest(l, recursive := true) FROM lst),
    p AS (SELECT doc, pos, sh FROM pos WHERE sh <> ''),
    dup AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc) AS c
            FROM p GROUP BY sh) WHERE c >= 2),
    m AS (SELECT doc, pos,
          row_number() OVER (PARTITION BY doc ORDER BY pos) AS rn
          FROM p WHERE sh IN (SELECT sh FROM dup))
    SELECT doc AS doc_id, min(pos) AS span_start, max(pos) AS span_end,
           count(*) AS n_shingles
    FROM m GROUP BY doc, pos - rn HAVING count(*) >= 2
""")
def llm_duplicate_spans(spark, sf_dir):
    """Maximal cross-document duplicated token spans (the ExactSubstr
    dedup of Lee et al. 2021 at shingle grain): positioned 3-shingles →
    corpus doc-frequency → gaps-and-islands run assembly."""
    from ..llm.spans import duplicate_spans
    return duplicate_spans(tables(spark, sf_dir, "documents"), k=3)


@query("llm_bm25_topk", sql=f"""
    WITH lens AS (SELECT doc_id, {SQL_TOKS} AS ts,
                  len({SQL_TOKS}) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, sum(dl) AS total FROM lens),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf
           FROM (SELECT doc_id, dl, unnest(ts) AS term FROM lens)
           GROUP BY doc_id, dl, term),
    idf AS (SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf
            FROM (SELECT term, count(*) AS df FROM tf GROUP BY term),
                 stats),
    q AS (SELECT doc_id AS qid, unnest(list_distinct(ts[1:8])) AS term
          FROM lens WHERE doc_id < 3),
    contrib AS (SELECT q.qid, tf.doc_id,
                CAST(idf.idf * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                        / (stats.total / stats.n)))
                     AS DECIMAL(38, 12)) AS s
                FROM tf JOIN idf USING (term) JOIN q USING (term)
                CROSS JOIN stats),
    scored AS (SELECT qid, doc_id,
               round(CAST(sum(s) AS DOUBLE), 6) AS bm25
               FROM contrib GROUP BY qid, doc_id)
    SELECT qid AS query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY qid
                ORDER BY bm25 DESC, doc_id) AS INT) AS rnk
    FROM scored QUALIFY rnk <= 5
""")
def llm_bm25_topk(spark, sf_dir):
    """BM25 top-5 retrieval (Okapi k1=1.2 b=0.75) with deterministic
    decimal-sum scoring; queries are the first 8 tokens of docs 0-2 (a
    fixed rule that scales with the corpus)."""
    from ..llm.retrieval import bm25_topk
    from ..llm.text import tokens
    d = tables(spark, sf_dir, "documents")
    q = (d.filter(F.col("doc_id") < 3)
         .select(F.col("doc_id").alias("query_id"),
                 F.array_join(F.slice(tokens("text"), 1, 8), " ")
                 .alias("text")))
    return bm25_topk(d, q, top_k=5)


@query("llm_tfidf_top_terms", sql=f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({SQL_TOKS}) AS token FROM documents),
    tf AS (SELECT doc, token, count(*) AS tf FROM tok GROUP BY doc, token),
    dtok AS (SELECT doc_id AS doc, unnest(list_distinct({SQL_TOKS})) AS token
             FROM documents),
    dfreq AS (SELECT token, count(*) AS doc_freq FROM dtok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (SELECT doc, tf.token,
               round(tf * ln(n_docs::DOUBLE / doc_freq), 6) AS tfidf
               FROM tf JOIN dfreq ON tf.token = dfreq.token, n)
    SELECT doc AS doc_id, token, tfidf, rnk
    FROM (SELECT doc, token, tfidf,
          row_number() OVER (PARTITION BY doc ORDER BY tfidf DESC, token) AS rnk
          FROM scored)
    WHERE rnk <= 3
""")
def llm_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf (ranked on
    rounded scores for engine-independent determinism)."""
    from ..llm.text import tf_idf_top_terms
    return tf_idf_top_terms(tables(spark, sf_dir, "documents"))


_SHUFFLE_KEY_SQL = _md5int_sql("'shuffle-v1|' || doc_id::VARCHAR")

# llm_shuffle_rank's operator (llm/text.shuffle_rank) is exercised by
# llm_pack_documents below, which carries shuffle_pos in its output — the
# driver caps the query list at 50, so the two order-derived operators
# share one gate query (see COVERAGE.md).

@query("llm_pack_documents", sql=f"""
    SELECT doc_id, length(text) AS n_chars_measured,
           row_number() OVER (ORDER BY {_SHUFFLE_KEY_SQL}, doc_id) AS shuffle_pos,
           CAST(floor((SUM(length(text)) OVER (
               ORDER BY {_SHUFFLE_KEY_SQL}, doc_id
               ROWS UNBOUNDED PRECEDING) - 1) / 2048) AS INT) AS pack_id
    FROM documents
""")
def llm_pack_documents(spark, sf_dir):
    """Greedy sequence packing to ~2048-char packs over the deterministic
    shuffle order, with the shuffle position carried in the output (also
    covers the llm/text.shuffle_rank operator). Both are enumerated by the
    bucketed two-phase pass — no single-task global sort in the plan."""
    from ..llm.text import pack_documents
    return pack_documents(tables(spark, sf_dir, "documents"))


@query("llm_decontaminate", sql=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    shq AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks),
    ex AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM shq),
    bench AS (SELECT DISTINCT shingle FROM ex
              JOIN documents d ON ex.doc = d.doc_id WHERE d.source = 'src0'),
    hits AS (SELECT DISTINCT doc FROM ex
             WHERE shingle IN (SELECT shingle FROM bench)
               AND doc NOT IN (SELECT doc_id FROM documents WHERE source = 'src0'))
    SELECT d.doc_id, (d.doc_id IN (SELECT doc FROM hits)) AS contaminated
    FROM documents d WHERE d.source <> 'src0'
""")
def llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs (source != src0) sharing
    any 3-gram shingle with the 'benchmark' subset (source = src0)."""
    from ..llm.text import decontaminate
    docs = tables(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontaminate(train, bench)


# --- dedup ---------------------------------------------------------------

@query("llm_exact_dedup", sql="""
    SELECT md5(text) AS text_md5, min(doc_id) AS kept_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
""")
def llm_exact_dedup(spark, sf_dir):
    """Exact dedup via hash-groupBy, lowest id kept."""
    return exact_dedup(tables(spark, sf_dir, "documents"))


#: hot-shingle cap for the registered Jaccard query: a shingle present in
#: D docs emits D(D-1)/2 candidate pairs from one postings row, so
#: boilerplate shingles explode quadratically at corpus scale. Capping
#: doc-frequency is standard stop-shingle pruning; pairs whose overlap
#: comes from informative (rare) shingles are unaffected, and the oracle
#: applies the identical cap so parity is exact.
JACCARD_MAX_DOC_FREQ = 50

@query("llm_ngram_jaccard_pairs", sql=f"""
    WITH {SQL_SHINGLE_EXPLODE},
    sizes AS (SELECT doc, count(*) AS n FROM ex GROUP BY doc),
    freq AS (SELECT shash, count(*) AS df FROM ex GROUP BY shash),
    kept AS (SELECT shash FROM freq WHERE df BETWEEN 2 AND {JACCARD_MAX_DOC_FREQ}),
    common AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
               FROM ex a JOIN ex b ON a.shash = b.shash AND a.doc < b.doc
               WHERE a.shash IN (SELECT shash FROM kept)
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common / (na.n + nb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sizes na ON doc_a = na.doc
    JOIN sizes nb ON doc_b = nb.doc
    WHERE round(n_common / (na.n + nb.n - n_common), 6) >= 0.5
""")
def llm_ngram_jaccard_pairs(spark, sf_dir):
    """3-gram Jaccard near-dup pairs (>= 0.5) via inverted-index postings
    with the documented hot-shingle cap (``JACCARD_MAX_DOC_FREQ``) so no
    single shingle can emit an unbounded pair explosion; at scale this
    additionally runs against LSH candidates rather than the corpus."""
    return ngram_jaccard_pairs(tables(spark, sf_dir, "documents"), threshold=0.5,
                               max_doc_freq=JACCARD_MAX_DOC_FREQ)


def _minhash_seeds_sql(num_hashes: int = 16) -> str:
    from ..llm.dedup import minhash_params

    values = ", ".join(f"({i}, {a}, {b})"
                       for i, (a, b) in enumerate(minhash_params(num_hashes)))
    return f"(VALUES {values}) seeds(seed, a, b)"


@query("llm_minhash_lsh_pairs", sql=f"""
    WITH {SQL_SHINGLE_EXPLODE},
    hashes AS (SELECT doc, seed,
               (a * (shash % 2147483647) + b) % 2147483647 AS h
               FROM ex, {_minhash_seeds_sql(16)}),
    sig AS (SELECT doc, seed, min(h) AS minhash FROM hashes GROUP BY doc, seed),
    buckets AS (SELECT doc, CAST(seed // 4 AS INT) AS band,
                md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bucket
                FROM sig GROUP BY doc, CAST(seed // 4 AS INT))
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM buckets a
    JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
""")
def llm_minhash_lsh_pairs(spark, sf_dir):
    """MinHash (16 hashes) + LSH (4 bands x 4 rows) candidate pairs —
    the no-O(n^2) dedup path."""
    return minhash_lsh_pairs(tables(spark, sf_dir, "documents"),
                             num_hashes=16, bands=4)


@query("llm_simhash", sql=f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({SQL_TOKS}) AS token FROM documents),
    cnt AS (SELECT doc, token, count(*) AS cnt FROM tok GROUP BY doc, token),
    h AS (SELECT doc, cnt, {_md5int_sql("token")} AS h FROM cnt),
    bits AS (SELECT unnest(generate_series(0, 59)) AS bit),
    contrib AS (SELECT doc, bit,
                sum(CASE WHEN (h >> bit) % 2 = 1 THEN cnt ELSE -cnt END) AS s
                FROM h, bits GROUP BY doc, bit)
    SELECT doc AS doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
               AS simhash
    FROM contrib GROUP BY doc
""")
def llm_simhash(spark, sf_dir):
    """60-bit SimHash signatures from unigram counts (integer shifts,
    relational formulation; width = the portable hash's full entropy,
    sign-safe BIGINT in both engines)."""
    return simhash(tables(spark, sf_dir, "documents"))


# --- similarity search ---------------------------------------------------

@query("llm_simhash_neardup", sql=f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({SQL_TOKS}) AS token FROM documents),
    cnt AS (SELECT doc, token, count(*) AS cnt FROM tok GROUP BY doc, token),
    h AS (SELECT doc, cnt, {_md5int_sql("token")} AS h FROM cnt),
    bits AS (SELECT unnest(generate_series(0, 59)) AS bit),
    contrib AS (SELECT doc, bit,
                sum(CASE WHEN (h >> bit) % 2 = 1 THEN cnt ELSE -cnt END) AS s
                FROM h, bits GROUP BY doc, bit),
    sig AS (SELECT doc, sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS sh
            FROM contrib GROUP BY doc)
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           bit_count(xor(a.sh, b.sh)) AS hamming
    FROM sig a JOIN sig b ON a.doc < b.doc
    WHERE bit_count(xor(a.sh, b.sh)) <= 4
""")
def llm_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs: hamming distance <= 4 on the 60-bit
    signature via pigeonhole block banding (5 blocks of 12 bits → a
    (block_idx, block_value) equi-join with ~n/4096 docs per bucket; no
    O(n^2) nested-loop stage — see the selectivity math in
    ``llm.dedup.simhash_neardup_pairs``). Results are EXACT — the oracle
    is the plain pairwise formulation."""
    return simhash_neardup_pairs(tables(spark, sf_dir, "documents"),
                                 bits=60, max_hamming=4)


_QUERY_IDS = list(range(10))

@query("llm_similarity_topk", sql=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v
          WHERE vec_id IN ({", ".join(map(str, _QUERY_IDS))})),
    s AS (SELECT query_id, vec_id AS neighbor_id,
          list_cosine_similarity(qe, e) AS sim
          FROM q, v WHERE vec_id <> query_id)
    SELECT query_id, neighbor_id, rank
    FROM (SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM s)
    WHERE rank <= 3
""")
def llm_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-3 neighbors for 10 query vectors — the exact
    ANN baseline (broadcast queries, codegen dot products)."""
    return brute_force_topk(tables(spark, sf_dir, "embeddings"),
                            query_ids=_QUERY_IDS, top_k=3)


#: 4 deterministic literal centroids for the trained-centroid assignment
#: gate query — the same md5-derived generator feeds the Spark literals
#: and the oracle SQL (no stored model, engine-reproducible)
_KMEANS_CENTROIDS = hyperplane_coefficients(dim=64, planes=4)


def _kmeans_assign_sql() -> str:
    """Oracle for the literal-centroid argmin: per-centroid cosine (the
    exact literals Spark inlines, NaN floored to -2.0 mirroring
    ``nanvl``) + a lowest-index-wins CASE argmax — the same tie-break as
    Spark's struct(sim, -cid) array_max."""
    sims = []
    for c in _KMEANS_CENTROIDS:
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        s = f"list_cosine_similarity(e, {lit})"
        sims.append(f"CASE WHEN isnan({s}) THEN -2.0 ELSE {s} END")
    s_cols = ", ".join(f"{s} AS s{i}" for i, s in enumerate(sims))
    k = len(sims)
    cases = " ".join(
        "WHEN " + " AND ".join(f"s{i} >= s{j}" for j in range(i + 1, k))
        + f" THEN {i}" for i in range(k - 1))
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        s AS (SELECT vec_id, {s_cols} FROM v)
        SELECT vec_id, CAST(CASE {cases} ELSE {k - 1} END AS INT)
            AS centroid_id
        FROM s
    """


@query("llm_kmeans_assign", sql=_kmeans_assign_sql())
def llm_kmeans_assign(spark, sf_dir):
    """Trained-centroid k-means assignment (``llm/similarity.py``
    ``kmeans_assign``): the k centroids are inlined as literals so the
    assignment is a ZERO-EXCHANGE projection (vs ``ivf_assign``'s
    broadcast join + shuffled argmin — gated via llm_ann_assign). This
    is the cell-routing step of the IVF/SemDeDup/classifier family at
    100 TB: pure map-side, pipelineable into the partitioned layout
    write."""
    from ..llm.similarity import kmeans_assign
    return kmeans_assign(tables(spark, sf_dir, "embeddings"),
                         _KMEANS_CENTROIDS)


@query("llm_perplexity_ngram", sql=f"""
    WITH tk AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    vocab AS (SELECT count(DISTINCT t) + 1 AS v
              FROM (SELECT unnest(ts) AS t FROM tk)),
    ng AS (SELECT doc_id, concat_ws(' ', ts[i], ts[i + 1]) AS context,
                  ts[i + 2] AS token
           FROM tk, unnest(range(1, greatest(len(ts) - 1, 1))) AS r(i)),
    ng_counts AS (SELECT context, token, count(*)::BIGINT AS c
                  FROM ng GROUP BY context, token),
    cx_counts AS (SELECT context, sum(c)::BIGINT AS c FROM ng_counts
                  GROUP BY context),
    scored AS (SELECT g.doc_id,
                      ln(coalesce(nc.c, 0) + 0.1)
                      - ln(coalesce(cc.c, 0) + 0.1 * vocab.v) AS logp
               FROM ng g
               LEFT JOIN ng_counts nc
                 ON g.context = nc.context AND g.token = nc.token
               LEFT JOIN cx_counts cc ON g.context = cc.context
               CROSS JOIN vocab),
    agg AS (SELECT doc_id, count(logp)::BIGINT AS n_ngrams,
                   avg(logp) AS avg_logp FROM scored GROUP BY doc_id)
    SELECT t.doc_id, coalesce(a.n_ngrams, 0)::BIGINT AS n_ngrams,
           round(a.avg_logp, 6) AS avg_logp,
           round(exp(-a.avg_logp), 6) AS perplexity
    FROM tk t LEFT JOIN agg a ON t.doc_id = a.doc_id
""")
def llm_perplexity_ngram(spark, sf_dir):
    """Trigram-LM perplexity scoring (``llm/lm.py`` — the CCNet-style
    corpus quality signal): train the add-k n-gram LM on the corpus (two
    count aggregations, model never driver-held) and score every doc via
    the two many-to-one LEFT joins. Docs shorter than n tokens report
    n_ngrams=0 / NULL scores."""
    from ..llm.lm import perplexity_ngram, train_ngram_lm
    docs = tables(spark, sf_dir, "documents")
    # lazy_vocab folds the V scalar into the scoring job (r11): zero
    # training-time driver jobs, identical scores (parity in test_lm)
    lm = train_ngram_lm(docs, n=3, lazy_vocab=True)
    return (perplexity_ngram(docs, lm, add_k=0.1)
            .select("doc_id", "n_ngrams",
                    F.round("avg_logp", 6).alias("avg_logp"),
                    F.round("perplexity", 6).alias("perplexity")))


_PAGERANK_ITERS = 3


def _pagerank_sql(iters: int, damping: float = 0.85) -> str:
    """Oracle for the distributed PageRank: the identical update as
    ``llm/graph.pagerank`` unrolled into a CTE chain — decimal(38,12)
    sums over 12-dp-rounded contributions make both engines'
    per-iteration aggregates order-independent and therefore
    bit-comparable."""
    parts = [f"""
    WITH e AS (SELECT DISTINCT 'u' || user_id::VARCHAR AS src,
                      event_type AS dst FROM events),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    outdeg AS (SELECT src AS node, sum(1.0) AS oud FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
    d{k} AS (SELECT coalesce(sum(CAST(round(r.rank, 12)
                 AS DECIMAL(38,12))), 0)::DOUBLE AS dang
             FROM r{p} r LEFT JOIN outdeg o USING (node)
             WHERE o.oud IS NULL),
    b{k} AS (SELECT (1.0 - {damping!r}) / nn.n
                    + {damping!r} * d{k}.dang / nn.n AS base
             FROM nn, d{k}),
    c{k} AS (SELECT e.dst AS node,
             sum(CAST(round(1.0 * (r.rank / o.oud), 12)
                 AS DECIMAL(38,12))) AS c
             FROM e JOIN r{p} r ON e.src = r.node
             JOIN outdeg o ON e.src = o.node GROUP BY e.dst),
    r{k} AS (SELECT nodes.node,
             b{k}.base + {damping!r} * coalesce(c{k}.c::DOUBLE, 0.0)
                 AS rank
             FROM nodes CROSS JOIN b{k}
             LEFT JOIN c{k} ON nodes.node = c{k}.node)""")
    parts.append(f"""
    SELECT node, round(rank, 12) AS rank FROM r{iters}""")
    return "".join(parts)


@query("llm_pagerank", sql=_pagerank_sql(_PAGERANK_ITERS))
def llm_pagerank(spark, sf_dir):
    """Distributed PageRank (``llm/graph.py`` — the host-reputation
    crawl-curation prior) over the bipartite user→event-type graph,
    three full iterations: per pass one edges⋈ranks join +
    one decimal-summed dst aggregate + two driver scalars (dangling
    mass, teleport). The oracle unrolls the identical update — green
    hashes certify the iterative operator end-to-end, not one step."""
    from ..llm.graph import pagerank
    ev = tables(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.col("event_type").alias("dst"))
    return pagerank(edges, iters=_PAGERANK_ITERS)


_CENTROID_IDS = list(range(8))


def _ann_assign_sql() -> str:
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, e,
              CAST({_hyperplane_terms_sql(64, 8)} AS BIGINT) AS bucket FROM v),
        c AS (SELECT vec_id AS centroid_id, e AS ce FROM v
              WHERE vec_id IN ({", ".join(map(str, _CENTROID_IDS))})),
        s AS (SELECT vec_id, bucket, centroid_id,
              list_cosine_similarity(e, ce) AS sim FROM b, c)
        SELECT vec_id, bucket, centroid_id
        FROM (SELECT vec_id, bucket, centroid_id,
              row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
              FROM s)
        WHERE rn = 1
    """


@query("llm_ann_assign", sql=_ann_assign_sql())
def llm_ann_assign(spark, sf_dir):
    """Both ANN partitioning keys in one corpus scan: hyperplane-LSH
    bucket (8 planes, map-side sign bits — `hyperplane_lsh_bucket`) and
    IVF cell (8 deterministic centroids, broadcast argmin — `ivf_assign`).
    The two operators remain separately callable; folded into one gate
    query for the 50-query driver cap."""
    from ..llm.similarity import ann_assign
    return ann_assign(tables(spark, sf_dir, "embeddings"), dim=64, planes=8,
                      centroid_ids=_CENTROID_IDS)




# --- r6 gate rotation: retrieval fusion, membership scoring, drift, ------
# --- semantic dedup, cross-corpus dedup, WET parsing ----------------------

@query("llm_rrf_fuse", sql="""
    WITH ra AS (SELECT lang AS q, doc_id AS doc,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id) AS rnk
                FROM documents QUALIFY rnk <= 10),
    rb AS (SELECT lang AS q, doc_id AS doc,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(text), doc_id) AS rnk
           FROM documents QUALIFY rnk <= 10),
    u AS (SELECT q, doc, CAST(1.0 / (60 + rnk) AS DECIMAL(38,18)) AS s
          FROM ra
          UNION ALL
          SELECT q, doc, CAST(1.0 / (60 + rnk) AS DECIMAL(38,18)) AS s
          FROM rb),
    f AS (SELECT q, doc, round(CAST(sum(s) AS DOUBLE), 9) AS rrf,
                 count(*)::BIGINT AS n_systems
          FROM u GROUP BY q, doc)
    SELECT q AS query_id, doc AS doc_id, rrf, n_systems,
           row_number() OVER (PARTITION BY q
                              ORDER BY rrf DESC, doc) AS rnk
    FROM f QUALIFY rnk <= 5
""")
def llm_rrf_fuse(spark, sf_dir):
    """Reciprocal-rank fusion (``llm/retrieval.py rrf_fuse`` — the
    hybrid-retrieval combiner for lexical + dense rankings) over two
    deterministic per-language rankings of the documents table (length
    rank and md5-order rank — incomparable scores, comparable ranks,
    exactly the situation RRF exists for). DECIMAL(38,18) contribution
    sums make the fused score order-independent across engines."""
    from pyspark.sql import Window

    from ..llm.retrieval import rrf_fuse
    docs = tables(spark, sf_dir, "documents")
    wa = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    wb = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    ra = (docs.select(F.col("lang").alias("query_id"), "doc_id",
                      F.row_number().over(wa).alias("rnk"))
          .filter(F.col("rnk") <= 10))
    rb = (docs.select(F.col("lang").alias("query_id"), "doc_id",
                      F.row_number().over(wb).alias("rnk"))
          .filter(F.col("rnk") <= 10))
    return rrf_fuse([ra, rb], k=60, top_k=5)


@query("llm_min_k_prob", sql=f"""
    WITH tk AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    vocab AS (SELECT count(DISTINCT t) + 1 AS v
              FROM (SELECT unnest(ts) AS t FROM tk)),
    ng AS (SELECT doc_id, concat_ws(' ', ts[i], ts[i + 1]) AS context,
                  ts[i + 2] AS token
           FROM tk, unnest(range(1, greatest(len(ts) - 1, 1))) AS r(i)),
    ng_counts AS (SELECT context, token, count(*)::BIGINT AS c
                  FROM ng GROUP BY context, token),
    cx_counts AS (SELECT context, sum(c)::BIGINT AS c FROM ng_counts
                  GROUP BY context),
    scored AS (SELECT g.doc_id,
                      ln(coalesce(nc.c, 0) + 0.1)
                      - ln(coalesce(cc.c, 0) + 0.1 * vocab.v) AS logp
               FROM ng g
               LEFT JOIN ng_counts nc
                 ON g.context = nc.context AND g.token = nc.token
               LEFT JOIN cx_counts cc ON g.context = cc.context
               CROSS JOIN vocab),
    agg AS (SELECT doc_id, list_sort(list(logp)) AS lp FROM scored
            GROUP BY doc_id),
    mk AS (SELECT doc_id, len(lp)::BIGINT AS n_ngrams,
                  greatest(CAST(ceil(len(lp) * 0.2) AS INT), 1)::BIGINT
                      AS n_bottom,
                  lp FROM agg)
    SELECT t.doc_id, coalesce(mk.n_ngrams, 0) AS n_ngrams,
           coalesce(mk.n_bottom, 0) AS n_bottom,
           CASE WHEN mk.n_ngrams > 0
                THEN round(list_reduce(lp[1:CAST(mk.n_bottom AS INT)],
                                       (a, x) -> a + x) / mk.n_bottom, 9)
           END AS min_k_avg_logp
    FROM tk t LEFT JOIN mk ON t.doc_id = mk.doc_id
""")
def llm_min_k_prob(spark, sf_dir):
    """Min-K% probability membership score (``llm/lm.py min_k_prob``,
    Shi et al. 2023): mean log-prob of each doc's LOWEST 20% of trigram
    events under the corpus LM — the same scored-events stage the
    perplexity gate exercises, plus the per-doc sorted bottom-k slice.
    The oracle folds the sorted slice left-to-right exactly as the
    Spark side's ``F.aggregate`` does, so the double sums are
    bit-identical."""
    from ..llm.lm import min_k_prob, train_ngram_lm
    docs = tables(spark, sf_dir, "documents")
    lm = train_ngram_lm(docs, n=3, lazy_vocab=True)  # r11, see perplexity
    out = min_k_prob(docs, lm, k_frac=0.2, add_k=0.1)
    return out.select("doc_id",
                      F.col("n_ngrams").cast("long").alias("n_ngrams"),
                      F.col("n_bottom").cast("long").alias("n_bottom"),
                      "min_k_avg_logp")


@query("llm_composition_drift", sql="""
    WITH ca AS (SELECT source AS grp, count(*)::BIGINT AS n_a
                FROM documents GROUP BY source),
    cb AS (SELECT source AS grp, count(*)::BIGINT AS n_b
           FROM documents WHERE doc_id % 3 <> 0 GROUP BY source),
    j AS (SELECT coalesce(ca.grp, cb.grp) AS grp,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
          FROM ca FULL JOIN cb ON ca.grp = cb.grp),
    t AS (SELECT grp, n_a, n_b,
                 n_a / (SELECT sum(n_a) FROM j) AS p,
                 n_b / (SELECT sum(n_b) FROM j) AS q
          FROM j)
    SELECT grp, n_a, n_b,
           round(p, 9) AS frac_a, round(q, 9) AS frac_b,
           round(q - p, 9) AS delta,
           round(CASE WHEN n_a > 0 THEN p / 2 * ln(p / ((p + q) / 2))
                      ELSE 0.0 END
                 + CASE WHEN n_b > 0 THEN q / 2 * ln(q / ((p + q) / 2))
                        ELSE 0.0 END, 9) AS js_term
    FROM t
""")
def llm_composition_drift(spark, sf_dir):
    """Corpus composition drift (``llm/text.py composition_drift``):
    per-source document fractions of the full corpus vs a filtered pass
    (every third doc dropped), with each group's Jensen-Shannon
    divergence term — sum(js_term) IS the JS divergence of the mix
    shift. Two group-cardinality aggregates; corpus-sized work is only
    the counts."""
    from ..llm.text import composition_drift
    docs = tables(spark, sf_dir, "documents")
    return composition_drift(docs, docs.filter(F.col("doc_id") % 3 != 0),
                             group_col="source")


def _semantic_dedup_sql(threshold: float = 0.4) -> str:
    """Oracle for SemDeDup: literal-centroid cell assignment (the
    llm_kmeans_assign expression), within-cell cosine pairs, then
    min-label propagation over the duplicate graph as a RECURSIVE CTE
    (the UNION dedups states, so propagation terminates once every node
    knows the smallest id in its component — exactly the connected-
    components semantics of ``dedup_keep_representative``)."""
    sims = []
    for c in _KMEANS_CENTROIDS:
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        s = f"list_cosine_similarity(e, {lit})"
        sims.append(f"CASE WHEN isnan({s}) THEN -2.0 ELSE {s} END")
    s_cols = ", ".join(f"{s} AS s{i}" for i, s in enumerate(sims))
    k = len(sims)
    cases = " ".join(
        "WHEN " + " AND ".join(f"s{i} >= s{j}" for j in range(i + 1, k))
        + f" THEN {i}" for i in range(k - 1))
    cos = ("list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e))"
           " * sqrt(list_dot_product(b.e, b.e)))")
    return f"""
        WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                             FROM embeddings),
        s AS (SELECT vec_id, e, {s_cols} FROM v),
        cells AS (SELECT vec_id, e, CASE {cases} ELSE {k - 1} END AS cell
                  FROM s),
        pr AS (SELECT a.vec_id AS pa, b.vec_id AS pb
               FROM cells a JOIN cells b
               ON a.cell = b.cell AND a.vec_id < b.vec_id
               WHERE round(CASE WHEN isnan({cos}) THEN 0.0
                           ELSE {cos} END, 6) >= {threshold}),
        edges AS (SELECT pa AS src, pb AS dst FROM pr
                  UNION ALL SELECT pb, pa FROM pr),
        cc(id, rep) AS (SELECT DISTINCT src, src FROM edges
                        UNION
                        SELECT e.dst, cc.rep FROM cc
                        JOIN edges e ON cc.id = e.src
                        WHERE cc.rep < e.dst),
        reps AS (SELECT id, min(rep) AS rep FROM cc GROUP BY id),
        losers AS (SELECT id FROM reps WHERE rep < id)
        SELECT em.vec_id, em.label FROM embeddings em
        ANTI JOIN losers l ON em.vec_id = l.id
    """


@query("llm_semantic_dedup", sql=_semantic_dedup_sql())
def llm_semantic_dedup(spark, sf_dir):
    """SemDeDup (``llm/similarity.py semantic_dedup``, Abbas et al.
    2023) with the gate's 4 literal centroids: cluster the embedding
    space map-side, call within-cell cosine >= 0.4 duplicates,
    keep the smallest id per connected duplicate group. Candidate work
    is sum-of-|cell|^2, never corpus^2."""
    from ..llm.similarity import semantic_dedup
    emb = tables(spark, sf_dir, "embeddings")
    return (semantic_dedup(emb, _KMEANS_CENTROIDS, threshold=0.4)
            .select("vec_id", "label"))


@query("llm_cross_corpus_neardup", sql=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    shq AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks),
    exs AS (SELECT doc_id AS doc, unnest(sh) AS sh FROM shq),
    ex AS (SELECT doc, {_md5int_sql('sh')} AS shash FROM exs),
    hashes AS (SELECT doc, seed,
               (a * (shash % 2147483647) + b) % 2147483647 AS h
               FROM ex, {_minhash_seeds_sql(16)}),
    sig AS (SELECT doc, seed, min(h) AS minhash FROM hashes
            GROUP BY doc, seed),
    buckets AS (SELECT doc, CAST(seed // 4 AS INT) AS band,
                md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed))
                    AS bucket
                FROM sig GROUP BY doc, CAST(seed // 4 AS INT)),
    cand AS (SELECT DISTINCT a.doc AS cdoc, b.doc AS rdoc
             FROM buckets a
             JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
             WHERE a.doc % 2 = 0 AND b.doc % 2 = 1),
    sizes AS (SELECT doc, count(*) AS n FROM exs GROUP BY doc),
    inter AS (SELECT c.cdoc, c.rdoc, count(*) AS ni
              FROM cand c
              JOIN exs ea ON ea.doc = c.cdoc
              JOIN exs eb ON eb.doc = c.rdoc AND eb.sh = ea.sh
              GROUP BY c.cdoc, c.rdoc),
    best AS (SELECT c.cdoc,
                    round(max(coalesce(i.ni, 0)
                              / (na.n + nb.n - coalesce(i.ni, 0))), 6)
                        AS best_jaccard
             FROM cand c
             LEFT JOIN inter i ON i.cdoc = c.cdoc AND i.rdoc = c.rdoc
             JOIN sizes na ON na.doc = c.cdoc
             JOIN sizes nb ON nb.doc = c.rdoc
             GROUP BY c.cdoc)
    SELECT d.doc_id,
           coalesce(best_jaccard >= 0.5, FALSE) AS neardup_of_reference,
           best_jaccard
    FROM documents d LEFT JOIN best ON best.cdoc = d.doc_id
    WHERE d.doc_id % 2 = 0
""")
def llm_cross_corpus_neardup(spark, sf_dir):
    """Cross-corpus near-dedup (``llm/dedup.py cross_corpus_neardup``):
    flag even-doc_id corpus docs that near-duplicate any odd-doc_id
    reference doc — MinHash band buckets on both sides, cross-side
    (band, bucket) equi-join for candidates, exact 3-shingle Jaccard
    verify bounded to candidates (never corpus^2)."""
    from ..llm.dedup import cross_corpus_neardup
    docs = tables(spark, sf_dir, "documents")
    return cross_corpus_neardup(docs.filter(F.col("doc_id") % 2 == 0),
                                docs.filter(F.col("doc_id") % 2 == 1),
                                k=3, num_hashes=16, bands=4, threshold=0.5)


@query("wet_parse", sql="""
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN 'warcinfo'
                WHEN doc_id % 7 = 0 THEN '_torn'
                WHEN doc_id % 5 = 0 THEN '_truncated'
                ELSE 'conversion' END AS warc_type,
           '<urn:uuid:' || doc_id || '>' AS record_id,
           'https://example.com/' || doc_id AS url,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE '2024-03-01 12:00:00' END AS warc_date,
           (CASE WHEN doc_id % 11 <> 0 AND doc_id % 7 = 0 THEN 0
                 ELSE length(text) END)::BIGINT AS n_chars,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 7 = 0 THEN md5('')
                ELSE md5(text) END AS text_md5
    FROM documents
""")
def wet_parse(spark, sf_dir):
    """WET (Common Crawl) record parsing semantics under the
    independent hash gate: construct one WARC record per document row
    (with deterministic malformed variants) and push it through the
    REAL parser (``sources/warc.py parse_wet_records`` — the shared
    core of read_wet and wet_quarantine_counts). The oracle states the
    EXPECTED parse independently from the construction rules, so
    header-field extraction, record classification, and byte-exact body
    isolation are all hash-checked:

    - doc_id % 11 == 0: a ``warcinfo`` record (dropped-by-type class);
    - doc_id %  7 == 0: TORN — header with no blank-line split
      (classified ``_torn``, body empty);
    - doc_id %  5 == 0: TRUNCATED — Content-Length overstates the body
      by 10 bytes (the marker-torn leading-fragment signature);
    - doc_id % 13 == 0: malformed WARC-Date (``try_to_timestamp`` ->
      NULL, record survives — the ANSI no-abort rule);
    - doc_id %  3 == 0 (plain conversions): Content-Length UNDERSTATES
      the body by 5 bytes — the U+FFFD-inflation shape a complete
      record with invalid input bytes produces; must still classify
      ``conversion`` (the strictly-shorter check, ADVICE r5).
    """
    from ..sources.warc import parse_wet_records
    docs = tables(spark, sf_dir, "documents")
    d = F.col("doc_id")
    typ_hdr = (F.when(d % 11 == 0, F.lit("warcinfo"))
               .otherwise(F.lit("conversion")))
    date_hdr = (F.when(d % 13 == 0, F.lit("not-a-date"))
                .otherwise(F.lit("2024-03-01T12:00:00Z")))
    octets = F.octet_length(F.encode("text", "UTF-8"))
    plain = (d % 11 != 0) & (d % 7 != 0)
    declared = (octets
                + F.when(plain & (d % 5 == 0), F.lit(10)).otherwise(F.lit(0))
                - F.when(plain & (d % 5 != 0) & (d % 3 == 0),
                         F.lit(5)).otherwise(F.lit(0)))
    header = F.concat(
        F.lit("WARC-Type: "), typ_hdr,
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"), d.cast("string"),
        F.lit(">\r\nWARC-Target-URI: https://example.com/"),
        d.cast("string"),
        F.lit("\r\nWARC-Date: "), date_hdr,
        F.lit("\r\nContent-Length: "), declared.cast("string"),
        F.lit("\r\n"))
    value = (F.when((d % 11 != 0) & (d % 7 == 0),
                    F.concat(header, F.col("text")))
             .otherwise(F.concat(header, F.lit("\r\n"), F.col("text"),
                                 F.lit("\r\n\r\n"))))
    parsed = parse_wet_records(docs.select(value.alias("value")))
    return parsed.select(
        F.regexp_extract("record_id", r"(\d+)", 1).cast("long")
        .alias("doc_id"),
        "warc_type", "record_id", "url",
        F.date_format("warc_date", "yyyy-MM-dd HH:mm:ss")
        .alias("warc_date"),
        F.length("text").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"))


# r7 displaced-oracle rotation (r6 verdict task 6): canonical-URL dedup
# and the corpus manifest gain their own DuckDB oracle rows without
# touching the 50-row gate. The documents table has no url column, so
# the URL query synthesizes urls from doc_id with the SAME deterministic
# expression it feeds the operator — six variants per collision group
# that exercise every canonicalization rule (scheme case, www. prefix,
# scheme-default port, tracking params, param order, trailing slash,
# unparseable loners). The oracle derives each variant's canonical form
# independently from the rules.

@query("llm_url_dedup", gate=False, sql="""
    WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 5 THEN NULL
                    WHEN doc_id % 6 IN (3, 4)
                      THEN 'https://example.com/p/' || (doc_id % 40)
                           || '?a=1&b=2'
                    ELSE 'https://example.com/p/' || (doc_id % 40)
               END AS canonical_url
        FROM documents)
    SELECT canonical_url, min(doc_id) AS kept_id,
           count(*) AS n_copies
    FROM u WHERE canonical_url IS NOT NULL GROUP BY 1
    UNION ALL
    SELECT NULL AS canonical_url, doc_id AS kept_id,
           1::BIGINT AS n_copies
    FROM u WHERE canonical_url IS NULL
""")
def llm_url_dedup(spark, sf_dir):
    """URL-grain exact dedup (``llm.text.url_dedup``): recrawls and
    tracking-tagged links collapse on :func:`llm.text.canonical_url`
    before any content hashing — the crawl pipeline's cheapest first
    pass. Map-side expression + one hash-groupBy; unparseable URLs
    keep themselves."""
    from ..llm.text import url_dedup

    d = tables(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 40).cast("string")
    v = F.col("doc_id") % 6
    url = (
        F.when(v == 0, F.concat(F.lit("https://www.example.com/p/"), g))
        .when(v == 1, F.concat(F.lit("HTTPS://example.com:443/p/"), g,
                               F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://example.com/p/"), g,
                               F.lit("?utm_source=x&fbclid=y")))
        .when(v == 3, F.concat(F.lit("https://example.com/p/"), g,
                               F.lit("?b=2&a=1")))
        .when(v == 4, F.concat(F.lit("https://example.com/p/"), g,
                               F.lit("?a=1&b=2")))
        .otherwise(F.lit("not a url")))
    return url_dedup(d.select("doc_id", url.alias("url")))


@query("llm_corpus_manifest", gate=False, sql=f"""
    SELECT count(*) AS n_docs,
           count(DISTINCT doc_id) AS n_distinct_ids,
           sum(length(text))::BIGINT AS n_chars_measured,
           sum(len({SQL_TOKS}))::BIGINT AS n_tokens,
           bit_xor({_md5int_sql("doc_id::VARCHAR || '|' || text")})
             AS corpus_checksum
    FROM documents
""")
def llm_corpus_manifest(spark, sf_dir):
    """Corpus manifest (``llm.text.corpus_manifest``): doc/char/token
    totals plus the order-independent ``bit_xor``-of-md5 content
    checksum — the reproducibility receipt exactly-once pipelines
    write next to the corpus (reshuffle-invariance pytest in
    ``test_llm_pipeline``; this row pins the VALUES against DuckDB)."""
    from ..llm.text import corpus_manifest

    d = tables(spark, sf_dir, "documents")
    return corpus_manifest(d)


# r7 second displaced rotation: the C4 line filter and the URL/domain
# profile operators gain their own DuckDB oracle rows (previously
# pytest-only; gate stays at 50). Docs carry no url column and mostly
# single-line text, so both synthesize their inputs with the SAME
# deterministic expression on both engines.

@query("llm_c4_line_filter", gate=False, sql="""
    WITH src AS (
        SELECT doc_id,
               text || chr(10) || 'Home About Contact' || chr(10)
                    || 'A proper sentence with enough words here.'
                    || chr(10) || 'tiny' AS t
        FROM documents),
    l AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM src),
    k AS (SELECT doc_id, lines,
                 list_filter(lines, ln ->
                     len(list_filter(string_split_regex(trim(ln), '\\s+'),
                                     w -> w <> '')) >= 3
                     AND regexp_matches(trim(ln), '[.!?"”]$')) AS keep
          FROM l)
    SELECT doc_id,
           array_to_string(keep, chr(10)) AS filtered_text,
           len(lines)::INT AS n_lines,
           (len(lines) - len(keep))::INT AS n_removed
    FROM k
""")
def llm_c4_line_filter(spark, sf_dir):
    """C4 line-grain cleanup (``llm/text.c4_line_filter``, Raffel et
    al. 2020): keep lines with >= 3 words ending in terminal
    punctuation — nav bars and cookie banners drop, survivors rejoin.
    Input synthesizes a 4-line doc (original text + a nav line + a
    proper sentence + a fragment) so every rule fires."""
    from ..llm.text import c4_line_filter

    d = tables(spark, sf_dir, "documents")
    txt = F.concat_ws(
        "\n", F.col("text"), F.lit("Home About Contact"),
        F.lit("A proper sentence with enough words here."), F.lit("tiny"))
    return c4_line_filter(d.select("doc_id", txt.alias("text")))


@query("llm_domain_stats", gate=False, sql="""
    SELECT CASE WHEN doc_id % 5 = 4 THEN NULL
                ELSE 'h' || (doc_id % 7) || '.example.com' END AS host,
           count(*) AS n_docs
    FROM documents GROUP BY 1
""")
def llm_domain_stats(spark, sf_dir):
    """Crawl composition profile (``llm/text.domain_stats``): docs per
    normalized host (lower-cased, www. stripped, NULL groups the
    unparseable URLs). The synthesized urls cycle 7 hosts, half with a
    www. prefix, one in five unparseable."""
    from ..llm.text import domain_stats

    d = tables(spark, sf_dir, "documents")
    d7 = (F.col("doc_id") % 7).cast("string")
    www = F.when(F.col("doc_id") % 2 == 0,
                 F.lit("www.")).otherwise(F.lit(""))
    url = F.when(F.col("doc_id") % 5 == 4, F.lit("nope")).otherwise(
        F.concat(F.lit("https://"), www, F.lit("h"), d7,
                 F.lit(".example.com/p")))
    return domain_stats(d.select(url.alias("url")))


@query("llm_domain_matches", gate=False, sql="""
    SELECT doc_id FROM documents
    WHERE doc_id % 5 = 2 AND doc_id % 11 <> 0
""")
def llm_domain_matches(spark, sf_dir):
    """Domain blocklist matching (``llm/text.domain_matches``): hosts
    explode into dot-suffixes and equi-join the broadcast list, so
    'b2.example.com' also covers 'a0.b2.example.com' — matching at the
    SUFFIX grain, case-insensitively, with unparseable hosts matching
    nothing."""
    from ..llm.text import domain_matches

    d = tables(spark, sf_dir, "documents")
    d3 = (F.col("doc_id") % 3).cast("string")
    d5 = (F.col("doc_id") % 5).cast("string")
    url = F.when(F.col("doc_id") % 11 == 0, F.lit("::::")).otherwise(
        F.concat(F.lit("https://a"), d3, F.lit(".b"), d5,
                 F.lit(".example.com/x")))
    domains = spark.createDataFrame([("B2.example.com",)], "domain string")
    return domain_matches(d.select("doc_id", url.alias("url")), domains)


_DSIR_BUCKETS = 512


def _dsir_weights_cte() -> str:
    """The shared DSIR weights pipeline as a WITH-clause body — used by
    both the weights oracle and the selection oracle."""
    b = _DSIR_BUCKETS
    h = _md5int_sql("gram")
    return f"""
    tk AS (SELECT doc_id, source, {SQL_TOKS} AS ts FROM documents),
    grams AS (
      SELECT doc_id, source, unnest(ts) AS gram FROM tk
      UNION ALL
      SELECT doc_id, source, concat_ws(' ', ts[i], ts[i + 1]) AS gram
      FROM tk, unnest(range(1, greatest(len(ts), 1)::BIGINT)) AS r(i)
    ),
    bkt AS (SELECT doc_id, source, {h} % {b} AS bucket FROM grams),
    tgt AS (SELECT bucket, count(*)::BIGINT AS ct FROM bkt
            WHERE source IN ('src0', 'src1') GROUP BY bucket),
    rawd AS (SELECT bucket, count(*)::BIGINT AS cr FROM bkt
             GROUP BY bucket),
    nt AS (SELECT coalesce(sum(ct), 0)::DOUBLE + 1.0 * {b} AS n FROM tgt),
    nr AS (SELECT coalesce(sum(cr), 0)::DOUBLE + 1.0 * {b} AS n
           FROM rawd),
    scored AS (SELECT bkt.doc_id,
                      round(ln((coalesce(t.ct, 0) + 1.0) / nt.n)
                          - ln((coalesce(r.cr, 0) + 1.0) / nr.n),
                            9)::DECIMAL(38,12) AS w
               FROM bkt LEFT JOIN tgt t USING (bucket)
               LEFT JOIN rawd r USING (bucket)
               CROSS JOIN nt CROSS JOIN nr),
    agg AS (SELECT doc_id, count(w)::BIGINT AS n_grams, sum(w) AS lw
            FROM scored GROUP BY doc_id)
    """


def _dsir_sql() -> str:
    """Oracle for the DSIR importance log-weights: the identical hashed
    uni+bigram bucket counts (md5 portable hash, same space-joined
    bigram strings), identical add-1 smoothing, and — the iterative
    parity rule — per-gram contributions rounded to 9 dp and summed as
    DECIMAL(38,12) so serial and distributed sums agree bit-for-bit."""
    return f"""
    WITH {_dsir_weights_cte()}
    SELECT d.doc_id, coalesce(a.n_grams, 0)::BIGINT AS n_grams,
           round(CAST(a.lw AS DOUBLE), 6) AS logweight
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN agg a USING (doc_id)
    """


#: selection size for the displaced dsir_select oracle (sf0.01
#: documents has 500 rows; 150 exercises a real boundary)
_DSIR_SELECT_N = 150


def _dsir_select_sql() -> str:
    """Oracle for the DSIR resampling step: the same Gumbel key Spark
    computes — ``logweight/T + (-ln(-ln(u)))`` with
    ``u = (md5int('dsir-v1|' || id)::DOUBLE + 1.0) / (2^60 + 2)`` —
    op-order mirrored EXACTLY (the hash is cast to double BEFORE the
    +1, which is then absorbed: hashes exceed 2^53, so integer-first
    addition would differ by an ulp on some ids), then the top-n by
    (key desc, id). Boundary gaps are ~1e-3 at this scale, orders of
    magnitude above any libm ln() last-bit divergence."""
    h_id = _md5int_sql("'dsir-v1|' || doc_id::VARCHAR")
    div = repr(float((1 << 60) + 2))
    return f"""
    WITH {_dsir_weights_cte()},
    w AS (SELECT d.doc_id, round(CAST(a.lw AS DOUBLE), 6) AS logweight
          FROM (SELECT DISTINCT doc_id FROM documents) d
          LEFT JOIN agg a USING (doc_id)),
    keyed AS (SELECT doc_id,
                     (logweight / 1.0)
                     + (-ln(-ln((({h_id})::DOUBLE + 1.0) / {div}))) AS k
              FROM w WHERE logweight IS NOT NULL)
    SELECT doc_id FROM keyed
    QUALIFY row_number() OVER (ORDER BY k DESC, doc_id) <= {_DSIR_SELECT_N}
    """


@query("llm_dsir_weights", gate=False, sql=_dsir_sql())
def llm_dsir_weights(spark, sf_dir):
    """DSIR data selection (``llm/lm.py dsir_importance_weights`` —
    Xie et al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023): score every raw document by the
    log-likelihood ratio of a TARGET-domain hashed-n-gram distribution
    (here: sources src0/src1) vs the RAW corpus distribution. The two
    models are ≤512-row bucket-count tables (one aggregation each,
    never a vocabulary); scoring is one gram explosion + two
    broadcast-sized LEFT joins + a per-doc decimal sum — the published
    at-scale selector, fully relational. Compose with ``dsir_select``
    (deterministic Gumbel-top-k) for the resampling step."""
    from ..llm.lm import dsir_importance_weights, train_hashed_ngram_dist

    docs = tables(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    t = train_hashed_ngram_dist(target, buckets=_DSIR_BUCKETS)
    raw = train_hashed_ngram_dist(docs, buckets=_DSIR_BUCKETS)
    return dsir_importance_weights(docs, t, raw)


@query("llm_dsir_select", gate=False, sql=_dsir_select_sql())
def llm_dsir_select(spark, sf_dir):
    """The DSIR RESAMPLING step (``llm/lm.py dsir_select``, r10
    scale-safe form — quantile-bracketed threshold + exact boundary
    band + semi-joined winners, no single-task top-n, no n-row
    broadcast): keep the top ``_DSIR_SELECT_N`` documents by
    deterministic Gumbel-perturbed importance weight. The oracle
    recomputes the identical key serially and takes the same top-n —
    proving the distributed threshold/band machinery selects EXACTLY
    the global ordered limit's set."""
    from ..llm.lm import (dsir_importance_weights, dsir_select,
                          train_hashed_ngram_dist)

    docs = tables(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    t = train_hashed_ngram_dist(target, buckets=_DSIR_BUCKETS)
    raw = train_hashed_ngram_dist(docs, buckets=_DSIR_BUCKETS)
    w = dsir_importance_weights(docs, t, raw)
    return dsir_select(docs.select("doc_id"), w, _DSIR_SELECT_N)
