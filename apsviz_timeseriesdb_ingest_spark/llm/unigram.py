"""Distributed unigram-LM tokenizer (Kudo 2018, "Subword Regularization"
— the SentencePiece unigram model, public paper) in the same
word-frequency-table formulation as :mod:`llm.bpe`: after one word-count
pass the corpus is never touched again; every training step runs over
the DISTINCT-word table ``(word, count)`` (the 100 TB shape: ~1e8
distinct words vs ~1e13 tokens), and the driver holds only the
vocabulary-sized model (piece → log-prob), exactly like k-means
centroids or the BPE merge list.

Training:

1. **Seed vocabulary**: every substring of every distinct word up to
   ``max_piece_len`` chars, weighted by word count (one map-side nested
   HOF expansion + one aggregate); all single characters are kept
   unconditionally (coverage guarantee), the rest is the top
   ``seed_size`` by weighted frequency with a lexicographic tie-break.
2. **EM**: the E-step runs distributed over distinct words — each word
   computes EXACT expected piece counts by forward-backward over its
   segmentation lattice (log-space, the model broadcast into an
   Arrow-batched ``mapInPandas``; per-word cost is O(len ·
   max_piece_len)), emits per-piece contributions ROUNDED to 12 dp and
   summed as DECIMAL (order-independent — the CLAUDE.md
   decimal-before-SUM rule, which is what makes the distributed E-step
   bit-reproducible and serially verifiable); the M-step normalizes the
   vocabulary-sized count vector on the driver.
3. **Pruning**: after each EM round the lowest-expected-count pieces
   are dropped (``prune_frac`` at a time, never single characters)
   until ``vocab_size`` remains — the expected-count variant of Kudo's
   likelihood-delta pruning (documented approximation: cheap, monotone,
   and exact about what actually hit the lattice; SentencePiece's
   Viterbi-delta refinement re-scores each candidate's removal).

Encoding is Viterbi (max-prob segmentation, leftmost-longest
tie-break): the corpus' distinct words segment once in an Arrow batch
pass, then join back and reassemble per document — the
``bpe.word_pieces`` flow. Unknown characters (absent from the seed
corpus) fall back to a floor log-prob so encoding is total.

Scope note: like :mod:`llm.bpe`, pieces never cross word boundaries
(the word-table formulation); SentencePiece's ▁-marker whole-sentence
lattice is the same algorithm with "word" = "sentence".

Serial verification: ``_train_unigram_py`` / ``_viterbi_py`` implement
the identical algorithm over a plain dict; tests assert the distributed
trainer matches piece-for-piece and log-prob-for-log-prob.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import _word_counts

#: log-prob floor for characters never seen at training time — keeps
#: Viterbi total without letting unknowns beat any real piece
UNK_LOG_PROB = -30.0

#: per-word piece contributions are rounded here before the decimal
#: sum — the fixed grid that makes distributed == serial exact
_ROUND_DP = 12


@dataclass(frozen=True)
class UnigramModel:
    """Piece inventory with log probabilities (natural log)."""

    pieces: tuple[str, ...]
    log_probs: tuple[float, ...]

    def as_dict(self) -> dict[str, float]:
        return dict(zip(self.pieces, self.log_probs))


# --- shared lattice math (runs in executors AND in the serial twin) ---

def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[dict[str, float], float]:
    """Exact expected piece counts for one word under the unigram model
    plus the word's log-likelihood. Lattice nodes are character
    positions 0..n; an edge i→j is the piece word[i:j] when in vocab."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    edges: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    for i in range(n):
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            edges[j].append((i, lp))
            if alpha[i] > -math.inf:
                a = alpha[i] + lp
                alpha[j] = a if alpha[j] == -math.inf else _logadd(alpha[j], a)
    if alpha[n] == -math.inf:  # unreachable word (training guards this)
        return {}, -math.inf
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for j in range(n, 0, -1):
        if beta[j] == -math.inf:
            continue
        for i, lp in edges[j]:
            b = beta[j] + lp
            beta[i] = b if beta[i] == -math.inf else _logadd(beta[i], b)
    total = alpha[n]
    out: dict[str, float] = {}
    for j in range(1, n + 1):
        for i, lp in edges[j]:
            if alpha[i] == -math.inf or beta[j] == -math.inf:
                continue
            g = math.exp(alpha[i] + lp + beta[j] - total)
            piece = word[i:j]
            out[piece] = out.get(piece, 0.0) + g
    return out, total


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _sample_py(word: str, logp: dict[str, float], max_len: int,
               alpha: float, seed: str) -> list[str]:
    """Sample a segmentation with probability ∝ P(seg)^alpha — the
    subword-regularization draw of Kudo 2018, via forward filtering /
    backward sampling over the same lattice as :func:`_viterbi_py`.
    The RNG is seeded from md5(seed|word), so the draw is a pure
    function of (word, seed): re-runs, engines, and partitionings all
    produce the same segmentation, and varying ``seed`` per epoch
    yields the per-epoch diversity the regularizer wants. alpha → ∞
    approaches Viterbi; alpha → 0 approaches uniform over segmentations.
    Unknown single characters use the UNK floor, as in Viterbi."""
    import hashlib
    import random

    n = len(word)
    alphas = [-math.inf] * (n + 1)
    alphas[0] = 0.0
    edges: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None and j - i == 1:
                lp = UNK_LOG_PROB
            if lp is None:
                continue
            lp *= alpha
            edges[j].append((i, lp))
            if alphas[i] > -math.inf:
                a = alphas[i] + lp
                alphas[j] = (a if alphas[j] == -math.inf
                             else _logadd(alphas[j], a))
    rng = random.Random(int(hashlib.md5(
        f"{seed}|{word}".encode()).hexdigest()[:15], 16))
    out = []
    j = n
    while j > 0:
        cands = [(i, alphas[i] + lp) for i, lp in edges[j]
                 if alphas[i] > -math.inf]
        mx = max(w for _, w in cands)
        weights = [math.exp(w - mx) for _, w in cands]
        total = sum(weights)
        u = rng.random() * total
        acc = 0.0
        pick = cands[-1][0]
        for (i, _), w in zip(cands, weights):
            acc += w
            if u <= acc:
                pick = i
                break
        out.append(word[pick:j])
        j = pick
    return out[::-1]


def _viterbi_py(word: str, logp: dict[str, float],
                max_len: int) -> list[str]:
    """Max-probability segmentation; ties prefer the LONGER last piece
    (deterministic across engines). Unknown single characters score
    ``UNK_LOG_PROB`` so segmentation is total."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None and j - i == 1:
                lp = UNK_LOG_PROB
            if lp is None or best[i] == -math.inf:
                continue
            s = best[i] + lp
            # strict > with i descending from j-1 ... range ascending:
            # use >= on smaller i to prefer the longer final piece
            if s > best[j] or (s == best[j] and i < back[j]):
                best[j], back[j] = s, i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


# --- serial reference trainer (the verification twin) -----------------

def _seed_py(word_counts: dict[str, int], seed_size: int,
             max_len: int) -> dict[str, float]:
    freq: dict[str, float] = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for length in range(1, min(max_len, len(w) - i) + 1):
                s = w[i:i + length]
                freq[s] = freq.get(s, 0.0) + c
    chars = {s for s in freq if len(s) == 1}
    multi = sorted((s for s in freq if len(s) > 1),
                   key=lambda s: (-freq[s], s))[:max(0, seed_size - len(chars))]
    vocab = chars | set(multi)
    total = sum(freq[s] for s in vocab)
    return {s: math.log(freq[s] / total) for s in vocab}


def _m_step(counts: dict[str, float], logp: dict[str, float],
            vocab_size: int, prune_frac: float,
            final: bool) -> dict[str, float]:
    """Normalize expected counts into the next model, pruning the
    lowest-count multi-char pieces (chars are permanent)."""
    kept = {s: counts.get(s, 0.0) for s in logp}
    if not final and len(kept) > vocab_size:
        multi = sorted((s for s in kept if len(s) > 1),
                       key=lambda s: (kept[s], s))
        n_drop = min(max(1, int(len(kept) * prune_frac)),
                     len(kept) - vocab_size, len(multi))
        for s in multi[:n_drop]:
            del kept[s]
    floor = 1e-12  # pieces the lattice never used survive at epsilon
    total = sum(max(c, floor) for c in kept.values())
    return {s: math.log(max(c, floor) / total) for s, c in kept.items()}


def _train_unigram_py(word_counts: dict[str, int], *, vocab_size: int,
                      seed_size: int, max_piece_len: int,
                      em_iters: int, prune_frac: float) -> UnigramModel:
    logp = _seed_py(word_counts, seed_size, max_piece_len)
    while True:
        final = len(logp) <= vocab_size
        for _ in range(em_iters):
            acc: dict = {}
            from decimal import Decimal
            for w, c in word_counts.items():
                exp_counts, _ = _forward_backward(w, logp, max_piece_len)
                for s, g in exp_counts.items():
                    q = Decimal(str(round(g * c, _ROUND_DP)))
                    acc[s] = acc.get(s, Decimal(0)) + q
            logp = _m_step({s: float(v) for s, v in acc.items()}, logp,
                           vocab_size, prune_frac, final=True)
        if final:
            break
        prev = len(logp)
        acc2 = {s: math.exp(lp) for s, lp in logp.items()}
        logp = _m_step(acc2, logp, vocab_size, prune_frac, final=False)
        if len(logp) >= prev:  # all-chars floor: cannot shrink further
            break
    pieces = tuple(sorted(logp))
    return UnigramModel(pieces=pieces,
                        log_probs=tuple(logp[s] for s in pieces))


# --- distributed trainer ----------------------------------------------

def _seed_vocab(words: DataFrame, seed_size: int,
                max_len: int) -> DataFrame:
    """(piece, freq) seed via map-side substring expansion. The nested
    single-arg lambdas keep the HOFs off the two-arg (element, index)
    trap; freq weights every OCCURRENCE by the word's count."""
    w = F.col("word")

    def subs_at(i):
        return F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_len),
                                         F.length(w) - i + 1)),
            lambda ln: F.substr(w, i, ln))

    subs = F.flatten(F.transform(F.sequence(F.lit(1), F.length(w)),
                                 lambda i: subs_at(i)))
    freq = (words.select(F.explode(subs).alias("piece"), "count")
            .groupBy("piece").agg(F.sum("count").alias("freq")))
    chars = freq.filter(F.length("piece") == 1)
    n_chars = chars.count()
    multi = (freq.filter(F.length("piece") > 1)
             .orderBy(F.desc("freq"), F.asc("piece"))
             .limit(max(0, seed_size - n_chars)))
    return chars.unionByName(multi)


def _expected_counts(words: DataFrame, logp: dict[str, float],
                     max_len: int) -> dict[str, float]:
    """One distributed E-step: per-word forward-backward in an Arrow
    batch pass (model broadcast via closure), per-piece contributions
    rounded then DECIMAL-summed — order-independent, so the result is
    bit-equal to the serial twin."""
    import pandas as pd

    def estep(batches):
        from decimal import Decimal

        for pdf in batches:
            # per-batch pre-aggregation in DECIMAL (exact, so the batch
            # split cannot perturb the sum), shipped as plain-format
            # strings and summed as decimal(38,12) Spark-side
            acc: dict = {}
            for word, cnt in zip(pdf["word"], pdf["count"]):
                exp_counts, _ = _forward_backward(word, logp, max_len)
                for s, g in exp_counts.items():
                    q = Decimal(str(round(g * int(cnt), _ROUND_DP)))
                    acc[s] = acc.get(s, Decimal(0)) + q
            yield pd.DataFrame({"piece": list(acc),
                                "c": [format(v, "f")
                                      for v in acc.values()]})

    rows = (words.mapInPandas(estep, "piece string, c string")
            .groupBy("piece")
            .agg(F.sum(F.col("c").cast("decimal(38,12)")).alias("c"))
            .collect())
    return {r["piece"]: float(r["c"]) for r in rows}


def train_unigram(df: DataFrame, *, vocab_size: int = 512,
                  seed_size: int = 2048, max_piece_len: int = 8,
                  em_iters: int = 2, prune_frac: float = 0.2,
                  text_col: str = "text", id_col: str = "doc_id",
                  sample_fraction: float | None = None,
                  max_words: int | None = None,
                  seed: str = "unigram-v1",
                  checkpoint_catalog=None,
                  checkpoint_prefix: str = "unigram",
                  resume: bool = False) -> UnigramModel:
    """Train a unigram-LM tokenizer distributed (see module docstring).

    ``sample_fraction``/``max_words`` bound the training word table the
    same way as :func:`llm.bpe.train_bpe` (deterministic md5 doc
    sample, top-K words). Driver memory: one vocabulary-sized dict.
    Each EM round costs ``em_iters`` lattice passes over the distinct
    word table plus one tiny aggregate; rounds shrink the vocabulary by
    ``prune_frac`` until ``vocab_size`` remains.

    Job-count math (r3 verdict finding #3): pruning from ``seed_size``
    down to ``vocab_size`` takes ``ceil(ln(vocab_size / seed_size) /
    ln(1 - prune_frac))`` rounds of ``em_iters`` Arrow lattice passes —
    e.g. 12288→4096 at ``prune_frac=0.2`` is 5 rounds ≈ 10 passes
    (+2 final): ~12 jobs total regardless of vocabulary, each bounded
    by the distinct-word table (NOTES_r4 soak has measured times). The
    job count scales with the vocab RATIO, not the corpus.

    ``resume=True`` (requires ``checkpoint_catalog``) makes a DRIVER
    loss recoverable: the vocabulary-sized model state is persisted to
    ``{checkpoint_prefix}_model`` after the seed vocabulary and after
    every pruning round (one overwrite of a (piece, logp) frame —
    doubles round-trip parquet exactly), and a resumed call reloads the
    words table and model and re-enters the EM loop, losing at most one
    round of EM passes. The resumed model is piece-for-piece and
    log-prob-for-log-prob identical to an uninterrupted run (tested) —
    every round is a deterministic function of (words, logp). The
    caller owns passing the SAME corpus/params (the
    :func:`llm.graph.pagerank` resume contract).
    """
    from ..operators.itercheckpoint import LineageCutter

    model_table = f"{checkpoint_prefix}_model"
    logp: dict[str, float] | None = None
    words = None
    if resume:
        if checkpoint_catalog is None:
            raise ValueError("resume=True requires checkpoint_catalog")
        if checkpoint_catalog.exists(model_table):
            # rebuild in the EXACT insertion order of the lost run's
            # dict: _m_step's total is a float sum in dict order, so a
            # reordered dict could produce a bitwise-different model
            logp = {r["piece"]: r["logp"]
                    for r in checkpoint_catalog.read(model_table)
                    .orderBy("idx").collect()}
            words = checkpoint_catalog.read(f"{checkpoint_prefix}_words_0")
    if logp is None:
        words = _word_counts(df, text_col, id_col, sample_fraction, seed)
        if max_words is not None:
            words = (words.orderBy(F.desc("count"), F.asc("word"))
                     .limit(max_words))
        # every EM pass re-reads this table; with a catalog the cut is a
        # durable table instead of executor-local blocks (itercheckpoint
        # contract — the executor-loss story for long trainings)
        words = LineageCutter(checkpoint_catalog, checkpoint_prefix)(
            words, "words")
        if not words.take(1):
            return UnigramModel(pieces=(), log_probs=())

        seed_rows = _seed_vocab(words, seed_size, max_piece_len).collect()
        total = sum(r["freq"] for r in seed_rows)
        logp = {r["piece"]: math.log(r["freq"] / total)
                for r in seed_rows}

    def persist_model() -> None:
        if checkpoint_catalog is not None:
            checkpoint_catalog.overwrite(
                df.sparkSession.createDataFrame(
                    [(i, s, lp) for i, (s, lp) in enumerate(logp.items())],
                    "idx int, piece string, logp double"),
                model_table)

    persist_model()
    while True:
        final = len(logp) <= vocab_size
        for _ in range(em_iters):
            counts = _expected_counts(words, logp, max_piece_len)
            logp = _m_step(counts, logp, vocab_size, prune_frac,
                           final=True)
        if final:
            break
        prev = len(logp)
        logp = _m_step({s: math.exp(lp) for s, lp in logp.items()},
                       logp, vocab_size, prune_frac, final=False)
        persist_model()
        if len(logp) >= prev:  # all-chars floor: cannot shrink further
            break
    pieces = tuple(sorted(logp))
    return UnigramModel(pieces=pieces,
                        log_probs=tuple(logp[s] for s in pieces))


def unigram_word_pieces(words: DataFrame, model: UnigramModel, *,
                        word_col: str = "word",
                        max_piece_len: int = 8,
                        sample_alpha: float | None = None,
                        sample_seed: str = "sp-v1") -> DataFrame:
    """Segment a distinct-word frame → ``(word_col, pieces)`` in one
    Arrow batch pass (model broadcast via closure, memoized per batch).
    Default is Viterbi; ``sample_alpha`` switches to the
    subword-regularization DRAW (segmentation sampled ∝ P^alpha, seeded
    per (word, sample_seed) — see :func:`_sample_py`): vary
    ``sample_seed`` per training epoch (e.g. from
    ``text.repeat_for_epochs``'s epoch column) for per-epoch
    segmentation diversity that is still fully reproducible."""
    import pandas as pd

    logp = model.as_dict()

    def seg(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for w in pdf[word_col].fillna("").astype(str):
                got = memo.get(w)
                if got is None:
                    if sample_alpha is None:
                        got = _viterbi_py(w, logp, max_piece_len)
                    else:
                        got = _sample_py(w, logp, max_piece_len,
                                         sample_alpha, sample_seed)
                    memo[w] = got
                out.append(got)
            yield pd.DataFrame({word_col: pdf[word_col], "pieces": out})

    return words.select(word_col).mapInPandas(
        seg, f"{word_col} string, pieces array<string>")


def unigram_encode_docs(df: DataFrame, model: UnigramModel, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_piece_len: int = 8,
                        sample_alpha: float | None = None,
                        sample_seed: str = "sp-v1") -> DataFrame:
    """Tokenize every doc → ``(id_col, unigram_tokens, n_unigram_tokens)``:
    segment the corpus' DISTINCT words once, then join back and
    reassemble per doc (the ``bpe_encode_docs`` shape — encoding cost
    scales with the vocabulary of the corpus, not its length).
    ``sample_alpha``/``sample_seed`` switch the segmentation from
    Viterbi to the subword-regularization draw (per-word, seeded —
    pass a per-epoch seed for regularized multi-epoch encodings)."""
    from .text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (df.repartition(par, id_col)
            .select(F.col(id_col).alias("__id"),
                    tokens(text_col).alias("__tk"))
            .select("__id", F.posexplode(F.col("__tk"))
                    .alias("__pos", "word")))
    vocab = unigram_word_pieces(toks.select("word").distinct(), model,
                                max_piece_len=max_piece_len,
                                sample_alpha=sample_alpha,
                                sample_seed=sample_seed)
    encoded = (toks.join(vocab, "word")
               .groupBy("__id")
               .agg(F.flatten(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__pos"), F.col("pieces")))),
                   lambda s: s["pieces"])).alias("unigram_tokens")))
    return (df.select(F.col(id_col).alias("__id"))
            .join(encoded, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("unigram_tokens",
                               F.expr("CAST(array() AS array<string>)"))
                    .alias("unigram_tokens"))
            .withColumn("n_unigram_tokens", F.size("unigram_tokens")))
