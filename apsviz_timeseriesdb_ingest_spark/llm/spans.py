"""Substring-level (span) deduplication: find duplicated PASSAGES
across documents, not just duplicated documents.

Document-level near-dedup (MinHash/SimHash) misses the common failure
mode of web corpora: distinct pages sharing a boilerplate paragraph, a
license block, or a quoted passage. The standard treatment (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022 —
public paper; suffix-array ExactSubstr) removes duplicated substrings
above a length threshold. This module implements the shingle-grain
variant of that idea as pure DataFrame relational algebra:

- a token position is *duplicated* if the k-token shingle starting
  there also occurs in at least one OTHER document;
- maximal runs of adjacent duplicated positions merge into spans
  (gaps-and-islands over the position sequence);
- spans shorter than ``min_span_shingles`` are kept out (incidental
  k-gram collisions — the precision/recall knob the paper tunes via
  its length threshold).

Scale shape: one (shingle-hash) shuffle builds document frequencies,
a semi-join marks duplicated positions on the same key (AQE reuses the
partitioning), and the islands window partitions BY DOCUMENT — state
bounded by one document's length, never the corpus. No suffix array is
materialized; at 100 TB this is shuffle-bound on the shingle explosion
exactly like MinHash signatures, which share the `_shingled` cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable_hash import md5_hash64
from .text import tokens


def positioned_shingles(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        fast: bool = False) -> DataFrame:
    """(doc, pos, shash) for EVERY k-shingle occurrence (0-based token
    position; NOT distinct — position identity is the point here,
    unlike ``dedup._shingled``). Empty-token docs produce no rows."""
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = F.col("__tk")
    shingle_at = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + j + 1) for j in range(k)]))
    # try_element_at, not element_at: ANSI throws on the out-of-bounds
    # index every sub-k-token doc produces (truncated final shingle ==
    # the oracle's slice semantics; the shingles_from_tokens fix, r4)
    return (
        df.repartition(par, id_col)
        .select(F.col(id_col).alias("doc"), tokens(text_col).alias("__tk"))
        .select("doc", F.posexplode(shingle_at).alias("pos", "shingle"))
        .filter(F.col("shingle") != "")
        .select("doc", "pos", md5_hash64("shingle", fast=fast).alias("shash"))
    )


def duplicate_spans(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    min_span_shingles: int = 2,
                    max_doc_freq: int | None = None,
                    fast: bool = False) -> DataFrame:
    """Maximal cross-document duplicated spans per document.

    Returns ``(doc_id, span_start, span_end, n_shingles)`` where
    ``span_start``/``span_end`` are 0-based token positions of the
    first and last duplicated shingle in the run — the span covers
    tokens ``[span_start, span_end + k - 1]``.

    ``min_span_shingles`` drops runs below the threshold (a single
    shared k-gram is usually noise; Lee et al. use a 50-token floor at
    corpus scale). ``max_doc_freq`` optionally ignores shingles that
    occur in more than that many documents — ubiquitous boilerplate
    ("all rights reserved") that would otherwise mark half the corpus;
    the same stop-shingle caveat as ``JACCARD_MAX_DOC_FREQ``.
    """
    sh = positioned_shingles(df, text_col=text_col, id_col=id_col, k=k,
                             fast=fast)
    freq = sh.groupBy("shash").agg(
        F.count_distinct("doc").alias("doc_freq"))
    dup_hashes = freq.filter(F.col("doc_freq") >= 2)
    if max_doc_freq is not None:
        dup_hashes = dup_hashes.filter(F.col("doc_freq") <= max_doc_freq)
    marked = sh.join(dup_hashes.select("shash"), "shash", "left_semi")
    # gaps-and-islands: consecutive positions share (pos - row_number)
    w = Window.partitionBy("doc").orderBy("pos")
    islands = marked.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy("doc", "grp")
        .agg(F.min("pos").alias("span_start"),
             F.max("pos").alias("span_end"),
             F.count("*").alias("n_shingles"))
        .filter(F.col("n_shingles") >= min_span_shingles)
        .select(F.col("doc").alias(id_col), "span_start", "span_end",
                "n_shingles")
    )


def split_sentences(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_chars: int = 1) -> DataFrame:
    """Heuristic sentence segmentation → ``(id, sentence_id, sentence)``
    (0-based position, original text preserved): split after ``.!?``
    runs followed by whitespace, with newlines as unconditional
    boundaries — the cheap regex segmenter pipelines use before
    sentence-grain dedup (``dedup_paragraphs`` on the output, joined by
    sentence) or per-sentence quality scoring. Known heuristic limits
    (documented, not handled): abbreviations ("Dr. Smith") and
    decimal points inside numbers split when followed by a space.

    Map-side only. The boundary pattern uses a lookbehind, which Spark's
    Java regex supports — an oracle twin would need a DuckDB-side
    reformulation (RE2 has no lookarounds, the CLAUDE.md rule), so this
    operator is pytest-covered rather than driver-gated.
    """
    sents = F.filter(
        F.split(F.col(text_col), r"(?<=[.!?])\s+|\n+"),
        lambda s: F.length(F.trim(s)) >= min_chars)
    return (df.select(id_col, F.posexplode(sents)
                      .alias("sentence_id", "sentence")))


def dedup_paragraphs(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id", max_freq: int = 1,
                     mode: str = "keep_first",
                     min_chars: int = 0) -> DataFrame:
    """Corpus-wide paragraph deduplication (the RefinedWeb / MassiveText
    boilerplate pass, paragraph grain): a paragraph occurring more than
    ``max_freq`` times across the corpus (within-doc repeats count too)
    is removed from every document — except,
    under ``mode="keep_first"`` (default), its single deterministic
    winner occurrence (smallest ``(doc, position)``), so unique content
    is never lost; ``mode="all"`` cuts every occurrence (pure
    boilerplate removal).

    Paragraphs split on blank-line runs; identity is the md5 of the
    whitespace-collapsed lower-cased body, so indentation/casing
    variants of the same boilerplate collapse. Paragraphs shorter than
    ``min_chars`` (normalized) are exempt — headers like "Introduction"
    repeat legitimately. Output rebuilds each doc with ``"\\n\\n"``
    between surviving paragraphs, original paragraph text preserved
    verbatim and in order: ``(id, deduped_text, n_paragraphs,
    n_removed)``. Every input doc appears in the output — all-removed
    or paragraph-free docs come back with empty text (tag-don't-filter:
    the caller decides to drop).

    Scale shape: one aggregate on the paragraph key (count + ``min``
    winner — map-side partial, uniform md5 keys), a many-to-one join
    back on the same key, and a per-document reassembly aggregate.
    State is bounded by one document's paragraphs; the corpus-wide
    frequency table holds one row per DISTINCT paragraph.
    """
    if mode not in ("keep_first", "all"):
        raise ValueError(f"unknown mode {mode!r}")
    par = df.sparkSession.sparkContext.defaultParallelism
    body = F.regexp_replace(F.lower(F.trim(F.col("para"))), r"\s+", " ")
    paras = (
        df.repartition(par, id_col)
        .select(F.col(id_col).alias("doc"),
                F.posexplode(F.split(F.col(text_col), r"\n[ \t\r]*\n+"))
                .alias("pos", "para"))
        .filter(F.trim(F.col("para")) != "")
        .select("doc", "pos", "para", md5_hash64(body).alias("pkey"),
                F.length(body).alias("plen")))
    stats = (paras.groupBy("pkey")
             .agg(F.count("*").alias("freq"),
                  F.min(F.struct("doc", "pos")).alias("winner")))
    flagged = (paras.join(stats, "pkey")
               .withColumn("drop", (F.col("freq") > max_freq)
                           & (F.col("plen") >= min_chars)))
    if mode == "keep_first":
        flagged = flagged.withColumn(
            "drop", F.col("drop")
            & ~((F.col("winner.doc") == F.col("doc"))
                & (F.col("winner.pos") == F.col("pos"))))
    rebuilt = (
        flagged.groupBy("doc")
        .agg(F.array_join(F.transform(
            F.array_sort(F.collect_list(F.when(
                ~F.col("drop"),
                F.struct("pos", "para")))),
            lambda s: s["para"]), "\n\n").alias("deduped_text"),
            F.count("*").alias("n_paragraphs"),
            F.sum(F.col("drop").cast("int")).alias("n_removed"))
        .select(F.col("doc").alias(id_col), "deduped_text",
                "n_paragraphs", "n_removed"))
    return (df.select(F.col(id_col))
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("deduped_text", F.lit("")).alias("deduped_text"),
                    F.coalesce("n_paragraphs", F.lit(0)).alias("n_paragraphs"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed")))


def mask_duplicate_spans(df: DataFrame, spans: DataFrame, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 3) -> DataFrame:
    """Remove duplicated spans from the text: rebuild each document
    from the tokens OUTSIDE every span (the paper's ExactSubstr 'cut'
    step, token-grain). Documents with no spans pass through with
    their token-normalized text (single-space joined, the same
    normalization the span coordinates are defined over).

    Returns (id, deduped_text, n_tokens_removed). The span join is
    aggregated per doc first (collect_list of [start, end+k-1] pairs —
    bounded by spans per doc, not corpus) and applied as one map-side
    filter over the token positions.
    """
    bounds = (spans.groupBy(id_col)
              .agg(F.collect_list(
                  F.array(F.col("span_start"),
                          F.col("span_end") + F.lit(k - 1))).alias("cuts")))
    toks = F.col("__tk")
    keep = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("cuts"),
            lambda c: (s["i"] >= c[0]) & (s["i"] <= c[1])))
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .join(bounds, id_col, "left")
        .withColumn("cuts", F.coalesce(
            F.col("cuts"), F.array().cast("array<array<int>>")))
        .select(
            id_col,
            F.array_join(F.transform(keep, lambda s: s["t"]), " ")
            .alias("deduped_text"),
            (F.size(toks) - F.size(keep)).alias("n_tokens_removed"))
    )
