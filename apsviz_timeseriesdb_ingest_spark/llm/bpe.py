"""Distributed BPE tokenizer: training and encoding on DataFrames.

Byte-pair encoding (Sennrich et al. 2016) in its word-frequency-table
formulation: training never touches the corpus after one word-count
pass — every merge iteration runs over the DISTINCT-word table
``(syms array<string>, count)``, which is orders of magnitude smaller
than the corpus (the 100 TB shape: ~1e8 distinct words vs ~1e13
tokens). Per merge the engine does

1. one pair-count aggregate (explode adjacent symbol pairs weighted by
   word count, one shuffle on tiny keys) and a driver-side top-1, then
2. one map-side HOF fold that rewrites only the symbol arrays
   (left-to-right, non-overlapping — the classic greedy merge order).

The driver holds only the ordered merge list (like k-means centroids),
never words or text. Real tokenizer trainings run on a corpus SAMPLE;
``sample_fraction`` (deterministic md5 keep test, re-runnable) and
``max_words`` (top-K words by count) bound the training set the same
way.

Encoding comes in two forms with identical output:

- ``engine="sql"``: apply the merge chain to the corpus' distinct-word
  table as nested HOF folds (checkpointed every ``chunk`` merges to
  bound plan depth), then join the pieces back and reassemble per doc.
  Zero Python — right for modest merge counts (a driver-gate-friendly,
  oracle-auditable path).
- ``engine="pandas"``: one Arrow-batched ``mapInPandas`` pass with a
  per-batch word→pieces memo — right for production vocabularies
  (32k merges as a chain of 32k folds would be absurd; as a dict-driven
  loop it is microseconds per distinct word).

No reference analogue (the reference ingests numeric timeseries); this
belongs to the training-data extension surface next to
``llm/text.token_stats``'s BPE-ish estimate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable_hash import md5_hash64

#: end-of-word marker appended as its own symbol before training
EOW = "</w>"

#: Java ``\s`` (ASCII) — the pandas encoder must split exactly like
#: ``llm.text.tokens`` or the two engines would tokenize differently
_WS = "[ \t\n\x0b\f\r]+"


@dataclass(frozen=True)
class BpeModel:
    """An ordered merge list plus the tokenizer's fixed conventions."""

    merges: tuple[tuple[str, str], ...]
    eow: str = EOW


def _char_syms(word: Column, eow: str) -> Column:
    """Initial symbol array: characters plus the end-of-word marker."""
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: F.substr(word, i, F.lit(1)))
    return F.concat(chars, F.array(F.lit(eow)))


def _merge_pairs_expr(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """A batch of NON-INTERACTING BPE merges as one left-to-right HOF
    fold: every non-overlapping adjacent ``(a, b)`` becomes ``a+b``.
    Seeding the accumulator with the first symbol keeps
    ``element_at(acc, -1)`` in-bounds under ANSI mode (symbol arrays
    are never empty: words are non-empty + eow).

    Batch precondition (enforced by the trainer's conflict filter): no
    pair's symbol equals another pair's symbol OR merged output — then
    at most one pair can match at any position, no pair can consume
    another's output within the pass, and one fused pass is exactly
    equivalent to applying the pairs sequentially in any order (which
    is what encoding does).

    The whole fold is guarded by a cheap ``arrays_overlap`` against the
    pairs' symbol set: a word containing NO symbol of any pair cannot
    merge, so the O(|syms|·|pairs|) fold is skipped for it (conditional
    evaluation in codegen). Merges target ever-rarer symbols as
    training progresses, so the guard prunes most of the word table in
    exactly the late passes that dominate long trainings (r6,
    measured)."""
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        out = F.concat(acc, F.array(x))
        for a, b in reversed(pairs):
            out = F.when(
                (F.element_at(acc, -1) == a) & (x == b),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(a + b)))).otherwise(out)
        return out

    touched = F.arrays_overlap(syms, F.array(*[
        F.lit(s) for s in dict.fromkeys(s for p in pairs for s in p)]))
    return F.when(touched, F.aggregate(rest, F.slice(syms, 1, 1), step)) \
        .otherwise(syms)


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """One BPE merge (the ``pairs=[(a, b)]`` case of
    :func:`_merge_pairs_expr`)."""
    return _merge_pairs_expr(syms, [(a, b)])


def _pair_counts(words: DataFrame) -> DataFrame:
    """``(a, b, c)`` — corpus-weighted counts of adjacent symbol pairs
    over a ``(syms, count)`` word table. The ``size >= 2`` guard keeps
    ``sequence(1, size - 1)`` ascending (the descending-sequence trap)
    and single-symbol words contribute no pairs by definition."""
    return (words
            .filter(F.size("syms") >= 2)
            .select("count", F.explode(F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"))))
                .alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("count").alias("c")))


def _word_counts(df: DataFrame, text_col: str, id_col: str,
                 sample_fraction: float | None, seed: str) -> DataFrame:
    """``(word, count)`` over (a deterministic sample of) the corpus."""
    from .text import tokens

    d = df
    if sample_fraction is not None:
        # md5 unit-interval keep test — same re-runnable doc sample on
        # any engine/cluster (see text.weighted_sample)
        keep = (md5_hash64(F.col(id_col).cast("string"), seed=seed)
                / F.lit(float(1 << 60))) < sample_fraction
        d = d.filter(keep)
    par = df.sparkSession.sparkContext.defaultParallelism
    return (d.repartition(par, id_col)
            .select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("count")))


def train_bpe(df: DataFrame, *, text_col: str = "text",
              id_col: str = "doc_id", num_merges: int = 64,
              min_count: int = 2, sample_fraction: float | None = None,
              max_words: int | None = None, batch: int = 1,
              seed: str = "bpe-v1", eow: str = EOW,
              checkpoint_catalog=None, checkpoint_prefix: str = "bpe",
              checkpoint_every: int = 1, resume: bool = False,
              pair_counts: str = "delta") -> BpeModel:
    """Learn ``num_merges`` BPE merges from a corpus.

    Deterministic: the winning pair is the highest weighted count with
    ties broken by smallest ``(a, b)`` — the same total order on every
    engine, so retraining reproduces the identical merge list. Stops
    early when the best pair's count drops below ``min_count`` (merging
    hapax pairs memorizes the sample) or no pairs remain.

    ``batch`` applies up to that many merges per pass (still 2 jobs per
    pass), selected greedily from the top pair counts under a conflict
    filter: a candidate is skipped when any of its symbols or its
    merged output collides with an already-chosen pair's symbols or
    output. Chosen pairs therefore cannot interact — their counts are
    exact at selection time and the fused pass equals sequential
    application — but a batch may order merges differently than strict
    one-at-a-time BPE (a merge can create a new pair that out-counts a
    later batch member; strict BPE would pick it first). ``batch=1``
    (default) is exact Sennrich; production vocab sizes (32k merges)
    want ``batch≈64`` to keep the pass count in the hundreds.

    Job-count math (r3 verdict finding #3): each pass is 2 driver
    round-trips (one pair-count aggregate over the distinct-word table
    + one fused merge-apply projection), so training costs about
    ``2 * ceil(num_merges / batch)`` Spark jobs — 32k merges is ~64k
    jobs at ``batch=1`` but ~1k at ``batch=64``; per-pass wall time is
    dominated by fixed job overhead at sample scale (~0.3-0.5 s
    locally, see NOTES_r4 soak: 8192 merges / batch=32 / 50k-word
    table). Tokenizers train on SAMPLES — pair ``batch`` with
    ``sample_fraction``/``max_words`` so the word table, not the
    corpus, bounds every pass.

    ``checkpoint_catalog`` routes the per-pass word-table lineage cut
    through durable ``{checkpoint_prefix}_*`` Catalog tables (every
    ``checkpoint_every``-th pass; ``operators.itercheckpoint``
    contract) instead of executor-local localCheckpoint blocks — the
    executor-loss story for long production-vocab trainings (r3
    verdict caveat). Identical merges either way (tested).

    ``pair_counts="delta"`` (default) maintains the per-pass pair-count
    table incrementally — subtract the CHANGED words' old pair counts,
    add their new ones — instead of re-aggregating pairs over the whole
    word table every pass (``"full"``, the pre-r6 behavior, kept for
    A/B measurement). Exact integer sums make the maintained table
    value-identical to a recount, so the selected merges are
    bit-for-bit the same in both modes (tested); what changes is the
    per-pass shuffle: |changed words| + |distinct pairs| rather than
    the full word table — the measured floor of the 8k-merge soak.

    ``resume=True`` (requires ``checkpoint_catalog``) makes a DRIVER
    loss recoverable: each durable words cut also overwrites a
    ``{checkpoint_prefix}_progress`` table holding the merge list so
    far plus the slot-table/cut-count pointer, and a resumed call
    reloads the words table and merge list and continues the training
    loop — losing at most ``checkpoint_every`` passes of work (a
    replayed pass regenerates the SAME merges: the winner selection is
    a deterministic function of the words table). The resumed model is
    merge-for-merge identical to an uninterrupted run (tested). The
    caller owns passing the SAME corpus/params — the tables cannot
    validate that (the :func:`llm.graph.pagerank` resume contract).
    """
    from ..operators.itercheckpoint import LineageCutter

    if batch < 1:
        raise ValueError("batch must be >= 1")
    cut = LineageCutter(checkpoint_catalog, checkpoint_prefix,
                        checkpoint_every)
    progress_table = f"{checkpoint_prefix}_progress"
    merges: list[tuple[str, str]] = []
    resumed = False
    if resume:
        if checkpoint_catalog is None:
            raise ValueError("resume=True requires checkpoint_catalog")
        if checkpoint_catalog.exists(progress_table):
            rows = (checkpoint_catalog.read(progress_table)
                    .orderBy("idx").collect())
            merges = [(r["a"], r["b"]) for r in rows]
            if len(merges) > num_merges:
                raise ValueError(
                    f"resume: stored progress has {len(merges)} merges but "
                    f"num_merges={num_merges} — the persisted state is "
                    "further along than the request; raise num_merges or "
                    f"drop the '{checkpoint_prefix}_*' tables for a fresh "
                    "run")
            words = checkpoint_catalog.read(rows[0]["table"])
            cut.seed("words", int(rows[0]["cuts"]))
            resumed = True
    if not resumed:
        words = _word_counts(df, text_col, id_col, sample_fraction, seed)
        if max_words is not None:
            words = words.orderBy(F.desc("count"), "word").limit(max_words)
        words = cut(words.select(_char_syms(F.col("word"), eow).alias("syms"),
                                 "count"), "words")

    if pair_counts not in ("full", "delta"):
        raise ValueError(f"pair_counts must be 'full' or 'delta', "
                         f"got {pair_counts!r}")
    # Delta mode (default): maintain the pair-count table incrementally.
    # A merge rewrites only the words CONTAINING the merged pair (a
    # vanishing fraction on Zipfian corpora), yet the full mode
    # re-aggregates pairs over EVERY word each pass — the measured
    # per-pass floor of the 8k-merge soak (NOTES_r4). Here each pass
    # subtracts the changed words' old pair counts and adds their new
    # ones (exact integer sums — the maintained table is value-identical
    # to a recount, so merge selection is bit-for-bit the same; tested),
    # and the shuffle is bounded by |changed words| + |distinct pairs|
    # instead of |word table|.
    pc = (cut(_pair_counts(words), "pairs")
          if pair_counts == "delta" else None)
    while len(merges) < num_merges:
        # over-fetch so the conflict filter still fills the batch
        source = pc if pc is not None else _pair_counts(words)
        top = (source.orderBy(F.desc("c"), "a", "b")
               .limit(max(4 * batch, 8)).collect())
        top = [r for r in top if r["c"] >= min_count]
        if not top:
            break
        chosen: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["a"], r["b"]
            if {a, b, a + b} & used:
                continue
            chosen.append((a, b))
            used.update((a, b, a + b))
            if len(chosen) == batch:
                break
        chosen = chosen[:num_merges - len(merges)]
        merges.extend(chosen)
        merged_expr = _merge_pairs_expr(F.col("syms"), chosen)
        if pc is not None:
            # ONE evaluation of the fused-merge expression per pass: the
            # cut materializes (new syms, old syms, count) together, and
            # both the delta aggregation and the next pass's word table
            # are projections of it (evaluating the batch-of-whens HOF
            # twice per pass measurably dominated the saved aggregate)
            staged = cut(words.select(merged_expr.alias("syms"),
                                      F.col("syms").alias("__old"),
                                      "count"), "words")
            # capture the WORDS slot pointer before the pairs cut below
            # clobbers cut.last_written (progress must point at words)
            words_table = cut.last_written
            changed = staged.filter(F.col("syms") != F.col("__old"))
            delta = (_pair_counts(changed.select(
                         F.col("__old").alias("syms"), "count"))
                     .select("a", "b", (-F.col("c")).alias("c"))
                     .unionByName(_pair_counts(
                         changed.select("syms", "count"))))
            pc = cut(pc.unionByName(delta)
                     .groupBy("a", "b").agg(F.sum("c").alias("c"))
                     .filter(F.col("c") > 0), "pairs")
            words = staged.select("syms", "count")
        else:
            words = cut(words.select(merged_expr.alias("syms"), "count"),
                        "words")
            words_table = cut.last_written
        if checkpoint_catalog is not None and words_table is not None:
            # merge list + slot pointer + cut count in ONE overwrite, so
            # the progress table is always self-consistent (a crash
            # between separate writes would desynchronize them); written
            # only on passes whose words cut was DURABLE, so the pointer
            # always names a slot that reflects exactly these merges
            checkpoint_catalog.overwrite(
                df.sparkSession.createDataFrame(
                    [(i, a, b, words_table, cut.count("words"))
                     for i, (a, b) in enumerate(merges)],
                    "idx int, a string, b string, table string, cuts int"),
                progress_table)
    return BpeModel(merges=tuple(merges), eow=eow)


def word_pieces(words: DataFrame, model: BpeModel, *,
                word_col: str = "word", chunk: int = 16,
                checkpoint_catalog=None,
                checkpoint_prefix: str = "bpe_encode") -> DataFrame:
    """Apply the merge chain to a distinct-word frame → ``(word_col,
    pieces array<string>)``. Plan depth is bounded by checkpointing
    every ``chunk`` merges (``checkpoint_catalog`` makes those cuts
    durable Catalog tables — ``operators.itercheckpoint`` contract);
    cost is |merges| map passes over the word table — fine for modest
    vocabularies, use the pandas engine beyond that (see module
    docstring)."""
    from ..operators.itercheckpoint import LineageCutter

    cut = LineageCutter(checkpoint_catalog, checkpoint_prefix)
    out = words.select(word_col,
                       _char_syms(F.col(word_col), model.eow).alias("pieces"))
    for i, (a, b) in enumerate(model.merges):
        out = out.select(word_col,
                         _merge_pair_expr(F.col("pieces"), a, b)
                         .alias("pieces"))
        if (i + 1) % chunk == 0 and i + 1 < len(model.merges):
            out = cut(out, "pieces")
    return out


def _encode_word_py(word: str, model: BpeModel,
                    memo: dict[str, list[str]]) -> list[str]:
    """Python twin of the SQL merge chain (sequential merges, each
    applied left-to-right) — the two engines must tokenize identically."""
    got = memo.get(word)
    if got is not None:
        return got
    syms = list(word) + [model.eow]
    for a, b in model.merges:
        if a not in syms or b not in syms:
            continue
        out = [syms[0]]
        for x in syms[1:]:
            if out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    memo[word] = syms
    return syms


def bpe_encode_docs(df: DataFrame, model: BpeModel, *,
                    text_col: str = "text", id_col: str = "doc_id",
                    engine: str = "sql",
                    checkpoint_catalog=None) -> DataFrame:
    """Tokenize every doc → ``(id_col, bpe_tokens array<string>,
    n_bpe_tokens)``. ``engine="sql"`` encodes the corpus' distinct-word
    table via the merge chain and reassembles docs with one
    position-sorted aggregate; ``engine="pandas"`` is a single
    Arrow-batched pass (see module docstring for when each wins)."""
    if engine == "pandas":
        return _encode_docs_pandas(df, model, text_col, id_col)
    if engine != "sql":
        raise ValueError(f"unknown engine {engine!r}")
    from .text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (df.repartition(par, id_col)
            .select(F.col(id_col).alias("__id"), tokens(text_col).alias("__tk"))
            .select("__id", F.posexplode(F.col("__tk"))
                    .alias("__pos", "word")))
    vocab = word_pieces(toks.select("word").distinct(), model,
                        checkpoint_catalog=checkpoint_catalog)
    encoded = (toks.join(vocab, "word")
               .groupBy("__id")
               .agg(F.flatten(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__pos"), F.col("pieces")))),
                   lambda s: s["pieces"])).alias("bpe_tokens")))
    return (df.select(F.col(id_col).alias("__id"))
            .join(encoded, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("bpe_tokens",
                               F.expr("CAST(array() AS array<string>)"))
                    .alias("bpe_tokens"))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens")))


def _encode_docs_pandas(df: DataFrame, model: BpeModel,
                        text_col: str, id_col: str) -> DataFrame:
    import re

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, bpe_tokens array<string>, "
              "n_bpe_tokens int")
    ws = re.compile(_WS)

    def encode(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            # fillna BEFORE astype: astype(str) would stringify None/NaN
            # into the literal words 'none'/'nan', diverging from the
            # SQL engine's empty token array on null text
            for text in pdf[text_col].fillna("").astype(str):
                words = [w for w in ws.split(text.lower()) if w]
                pieces: list[str] = []
                for w in words:
                    pieces.extend(_encode_word_py(w, model, memo))
                toks.append(pieces)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bpe_tokens": toks,
                "n_bpe_tokens": [len(t) for t in toks],
            })

    par = df.sparkSession.sparkContext.defaultParallelism
    return (df.repartition(par, id_col)
            .select(id_col, text_col).mapInPandas(encode, schema))


def subword_vocabulary(encoded: DataFrame, *,
                       tokens_col: str = "bpe_tokens",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus subword vocabulary ``(piece, n_uses, n_docs)`` from
    :func:`bpe_encode_docs` output — ONE scan of the (typically lazy
    and expensive) encoded lineage: explode once carrying the doc id,
    then count uses and distinct docs in the same aggregate."""
    return (encoded
            .select(F.col(id_col).alias("__id"),
                    F.explode(tokens_col).alias("piece"))
            .groupBy("piece")
            .agg(F.count("*").alias("n_uses"),
                 F.count_distinct("__id").alias("n_docs")))
