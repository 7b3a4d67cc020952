"""Mergeable corpus sketches (Apache DataSketches HLL via Spark's
``hll_sketch_agg`` family — public, built into Spark 3.5+/4).

The incremental-monitoring companion to the persisted indexes: corpus
statistics that need DISTINCT counts (vocabulary size, distinct-content
count → exact-dup rate) normally cost a corpus-wide shuffle per
measurement. A sketch row is computed ONCE per increment (one pass,
map-side partial aggregation, kilobytes of state), appended to a stats
table, and any window of increments merges in O(rows) with NO rescan —
union of HLL sketches at equal ``lg_k`` is lossless (register-wise
max), so the merged estimate equals the estimate of one sketch over
the concatenated data, exactly (tested).

Uses:

- vocabulary growth across dumps (the Heaps-law curve that decides
  tokenizer retraining) from the ``vocab_sketch`` column;
- exact-duplicate-rate trend without any dedup join:
  ``n_docs - estimate(content_sketch)`` estimates the duplicate count
  of the window (content = md5 of text, the ``exact_dedup`` key);
- per-source splits via ``group_by`` (composition monitoring at
  sketch, not corpus, cost).

Accuracy: standard HLL — relative standard error ≈ 1.04/sqrt(2^lg_k)
(~0.8% at the default lg_k=14). All distinct-count columns here are
ESTIMATES; exact paths stay `a2_count_distinct`/`exact_dedup`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: default HLL precision: 2^14 registers ≈ 0.8% RSE, ~16 KB dense
DEFAULT_LG_K = 14


def corpus_sketch(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", lg_k: int = DEFAULT_LG_K,
                  group_by: Sequence[str] = ()) -> DataFrame:
    """One mergeable stats row (per ``group_by`` group, else per corpus
    slice): ``(…group cols…, n_docs, n_tokens, vocab_sketch,
    content_sketch)``. One corpus pass; the token explode is the only
    expansion and it feeds a map-side partial HLL aggregate."""
    keys = list(group_by)
    base = df.select(*keys, F.col(id_col).alias("__id"),
                     tokens(text_col).alias("__tk"),
                     F.md5(F.coalesce(F.col(text_col), F.lit("")))
                     .alias("__content"))
    tok = base.select(*keys, "__id", "__content",
                      F.explode_outer("__tk").alias("__t"))
    agg = (tok.groupBy(*keys)
           .agg(F.count_distinct("__id").alias("n_docs"),
                F.count("__t").alias("n_tokens"),
                F.hll_sketch_agg("__t", F.lit(lg_k)).alias("vocab_sketch"),
                F.hll_sketch_agg("__content", F.lit(lg_k))
                .alias("content_sketch")))
    return agg


def merge_corpus_sketches(sketches: DataFrame, *,
                          group_by: Sequence[str] = ()) -> DataFrame:
    """Merge sketch rows (e.g. a window of per-increment rows from a
    stats table) into one row per ``group_by`` group — same schema as
    :func:`corpus_sketch`, counts summed, sketches HLL-unioned
    (lossless at equal lg_k). O(rows), no corpus access."""
    keys = list(group_by)
    return (sketches.groupBy(*keys)
            .agg(F.sum("n_docs").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.hll_union_agg("vocab_sketch").alias("vocab_sketch"),
                 F.hll_union_agg("content_sketch")
                 .alias("content_sketch")))


def sketch_estimates(sketches: DataFrame) -> DataFrame:
    """Readable estimates for sketch rows: adds ``vocab_estimate``,
    ``distinct_content_estimate``, and ``est_duplicate_docs``
    (``n_docs - distinct content`` — the exact-dup-rate proxy, floored
    at 0 since the estimator can overshoot n_docs)."""
    return (sketches
            .withColumn("vocab_estimate",
                        F.round(F.hll_sketch_estimate("vocab_sketch"))
                        .cast("long"))
            .withColumn("distinct_content_estimate",
                        F.round(F.hll_sketch_estimate("content_sketch"))
                        .cast("long"))
            .withColumn("est_duplicate_docs",
                        F.greatest(
                            F.col("n_docs")
                            - F.col("distinct_content_estimate"),
                            F.lit(0).cast("long"))))
