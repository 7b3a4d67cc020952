"""End-to-end training-corpus preparation: the composition every
large-scale pipeline runs, expressed as ONE Spark lineage.

``prepare_training_corpus`` chains the package's operators the way a
production pre-training data pipeline does:

    [paragraph dedup] -> [domain blocklist] -> clean -> PII scrub
          -> quality gates -> language gate
          -> exact dedup -> MinHash-LSH near-dedup
          -> benchmark decontamination -> train/eval split

Design points (the 100 TB shape):

- **Tag, don't filter.** Every document gets a ``drop_reason`` (NULL =
  kept) instead of being progressively discarded, so the final corpus AND
  the per-stage attrition stats come from the same lineage — one job for
  stats, one for the corpus, no per-stage ``count()`` actions. At scale
  this also yields the audit trail (why did doc X disappear?) for free.
- **One projection for all per-row signals.** Cleaning, scrubbing,
  tokenization, quality ratios, and language scores are map-side Column
  expressions folded into a single narrow stage — not per-operator
  DataFrame joins (each of which would shuffle the corpus on id).
  The token array is materialized once in its own projection (Catalyst
  re-evaluates multi-referenced non-cheap expressions otherwise; see
  ``dedup.shingles_from_tokens``).
- **Dedup/decontaminate reuse the bucketed operators** — MinHash-LSH
  band-bucket equi-join (no O(n^2) stage), connected components by
  min-label propagation, broadcast shingle semi-join. Later stages only
  see earlier-stage survivors, so the expensive near-dup pass never runs
  over documents that quality gates already rejected.

Reference parity note: the reference engine (RENCI/apsviz-timeseriesdb-
ingest) has no training-data pipeline; this module is part of the
training-data extension suite (SURVEY.md "Training-data extensions").
The stages themselves are individually driver-gated (llm_pii_scrub —
which also gates the clean_text regexp class, llm_token_stats (the
text_stats fold), llm_language_id, llm_exact_dedup,
llm_minhash_lsh_pairs, llm_decontaminate, and llm_gopher_stats — which
carries the train-split and mixture expressions); the
composition contains the iterative connected-components step, which is
not expressible as a single SQL oracle — pytest covers it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs, neardup_clusters
from .text import (
    DEFAULT_LANG_PROFILES,
    clean_text_expr,
    language_pred_col,
    language_score_cols,
    scrub_pii_expr,
    tokens,
    train_split_cols,
)

#: drop reasons in decision order (first failing stage wins)
DROP_REASONS = ("blocked_domain", "too_short", "too_long", "repetitive",
                "language", "blocked_terms", "low_quality",
                "high_perplexity", "exact_dup", "near_dup",
                "contaminated", "mixture_sampled", "dsir_resampled")


def corpus_signals(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   profiles: dict[str, tuple[str, ...]] | None = None,
                   ) -> DataFrame:
    """Per-document signal frame in one map-side stage: cleaned+scrubbed
    text, token count, repetition ratio, predicted language.

    Output: (id, text, n_tokens, repetition_ratio, predicted_lang) where
    ``text`` is the cleaned+scrubbed form downstream stages consume.
    """
    profiles = profiles or DEFAULT_LANG_PROFILES
    scrubbed = scrub_pii_expr(clean_text_expr(F.col(text_col)))
    toks = F.col("__tk")
    n = F.size(toks)
    scores = language_score_cols(toks, profiles)
    return (
        docs.select(F.col(id_col).alias(id_col), scrubbed.alias("text"))
        .select(id_col, "text", tokens("text").alias("__tk"))
        .select(
            id_col, "text",
            n.alias("n_tokens"),
            F.when(n > 0, F.round(F.lit(1) - F.size(F.array_distinct(toks)) / n, 6))
            .otherwise(F.lit(0.0)).alias("repetition_ratio"),
            *[s.alias(f"score_{lang}") for lang, s in scores.items()],
        )
        .withColumn("predicted_lang", language_pred_col(sorted(profiles)))
        .drop(*[f"score_{lang}" for lang in profiles])
    )


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_repetition_ratio: float = 0.9,
    languages: tuple[str, ...] = ("en",),
    profiles: dict[str, tuple[str, ...]] | None = None,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
    train_pct: int = 95,
    fast: bool = False,
    cache: bool = True,
    catalog=None,
    checkpoint_prefix: str = "corpus_prep",
    quality_model: tuple | None = None,
    min_quality_prob: float = 0.5,
    perplexity_lm: dict | None = None,
    max_perplexity: float | None = None,
    paragraph_max_freq: int | None = None,
    blocked_domains: DataFrame | None = None,
    url_col: str = "url",
    mixture_rates: dict[str, float] | None = None,
    source_col: str = "source",
    default_mixture_rate: float = 1.0,
    c4_lines: bool = False,
    c4_min_words: int = 3,
    blocked_terms: tuple[str, ...] | None = None,
    min_overlap_frac: float | None = None,
    unicode_form: str | None = None,
    dsir: tuple[DataFrame, int | float] | None = None,
    dsir_buckets: int = 4096,
    dsir_temperature: float = 1.0,
    dsir_seed: str = "dsir-v1",
) -> tuple[DataFrame, DataFrame]:
    """Run the full corpus-preparation pipeline.

    Returns ``(corpus, audit)``:

    - ``corpus``: kept documents — (id, text, n_tokens, predicted_lang,
      split_bucket, split) with cleaned+scrubbed text and the
      deterministic hash split.
    - ``audit``: EVERY input document with its ``drop_reason`` (NULL for
      kept docs) — ``audit.groupBy("drop_reason").count()`` is the
      attrition report.

    ``benchmark`` is the eval-set frame to decontaminate against (same
    text/id columns); None skips that stage. ``fast=True`` switches the
    dedup hashing to xxhash64 (production mode, no oracle parity).
    ``max_bucket_size`` caps per-LSH-bucket pair generation against
    near-identical spam clusters (exact dedup runs first, so oversized
    buckets are spam, not legitimate dups — see
    ``dedup.lsh_pairs_from_buckets`` for the exactness caveat).

    ``cache`` persists the frames the DAG reuses (the tagged signal
    frame, the three loser sets): the audit references each dedup stage
    2-3x and Spark re-evaluates lineages per reference — uncached, the
    5k-doc sf0.1 soak spends 52s recomputing the MinHash pipeline;
    cached it is ~6x faster and the corpus job is nearly free after the
    attrition job. MEMORY_AND_DISK so a 100x corpus degrades to disk
    spill, not OOM; callers running fire-and-forget can pass
    ``cache=False`` (pure-lazy) or ``spark.catalog.clearCache()`` after.

    ``quality_model`` = (weights, bias, means, stds) from
    ``classifier.train_logreg`` / ``standardize_stats``: heuristic
    survivors are scored by the learned filter and docs below
    ``min_quality_prob`` drop with reason ``low_quality``.
    ``perplexity_lm`` = the ``lm.train_bigram_lm`` count tables (train
    it on a REFERENCE corpus, not this one): survivors scoring above
    ``max_perplexity`` drop with reason ``high_perplexity``. Both
    learned stages run AFTER the heuristic tags (cheapest-first) and
    BEFORE dedup, and both add their score column to the audit frame
    (NULL where the stage didn't run or the doc was already dropped) —
    tag-don't-filter, same as everything else here.

    ``paragraph_max_freq`` runs :func:`spans.dedup_paragraphs` on the
    RAW text of the domain-gate survivors (cleaning collapses the
    blank-line structure paragraphs are defined over, and a keep-first
    winner must never land in a doc the domain gate is about to drop):
    corpus-repeated paragraphs are cut, keeping one winner occurrence.
    This is a transform, not a drop — a doc reduced to nothing then
    tags ``too_short`` downstream. ``blocked_domains`` (one ``domain``
    column; suffix-matched via :func:`text.domain_matches` over
    ``url_col`` on the ORIGINAL frame) tags matching docs
    ``blocked_domain`` — the FIRST reason in decision order, since it
    needs no content at all.

    ``c4_lines`` runs :func:`text.c4_line_filter` on the RAW text
    (line structure predates cleaning, same reasoning as paragraph
    dedup) after the paragraph stage — per-doc and map-side, so it
    applies to every doc; a doc filtered to nothing tags ``too_short``
    downstream. ``blocked_terms`` adds the C4 bad-words gate as a
    ``blocked_terms`` drop reason over the cleaned text's tokens.

    ``unicode_form`` (e.g. ``"NFKC"``) canonicalizes the text FIRST —
    before any signal or content hash — so composed/decomposed/
    full-width variants collide in every dedup grain
    (:func:`text.normalize_unicode`).

    ``min_overlap_frac`` switches the decontamination stage to the
    fractional-overlap rule (see :func:`text.decontaminate`) — the
    tolerant setting for benchmark lists that share phrasing with
    ordinary prose; None keeps the strict any-shingle rule.

    ``mixture_rates`` applies :func:`text.corpus_mixture`'s
    source-weighted downsampling as the LAST decision (reason
    ``mixture_sampled``): the keep test is a pure function of
    (id, source), so it commutes with every other stage, but
    precedence-last keeps the audit attributing docs to the cheaper
    reason that also dropped them. Upsampling (epochs > 1) is a
    repetition schedule, not a filter — run
    :func:`text.repeat_for_epochs` on the returned corpus.

    ``dsir`` = ``(target_frame, n_or_frac)`` runs DSIR importance
    resampling (Xie et al. 2023) as the FINAL decision, after every
    filter and after mixture: the raw distribution is trained on the
    surviving candidate pool (docs a dropped stage removed must not
    occupy selection slots), the target distribution on
    ``target_frame`` (same ``text_col``/``id_col``), and
    :func:`lm.dsir_select` keeps ``n`` docs (an ``int``) or
    ``ceil(frac · pool)`` docs (a ``float`` ≤ 1.0) — deterministic
    Gumbel-top-k under ``dsir_seed``/``dsir_temperature``. Non-selected
    docs drop with reason ``dsir_resampled``; every doc that reached
    the stage carries its ``dsir_logweight`` score in the audit
    (tag-don't-filter). The hashed-gram stream is built ONCE
    (:func:`lm.dsir_grams`) and shared by the raw distribution and the
    weights, and both it and the weights go through the same
    ``cache``/``catalog`` checkpoint policy as every reused frame.

    ``catalog`` (a ``sources.catalog.Catalog``) switches the reused
    intermediates from executor cache to CHECKPOINT TABLES
    (``{checkpoint_prefix}_*``, written once, read back): the 100 TB
    form — the tagged frame is corpus-sized, and at that scale reused
    intermediates belong in table storage, not executor memory/disk
    (r2 verdict). Overrides ``cache``; tables are left in place as the
    audit trail and can be dropped by the caller afterwards.
    """
    from pyspark import StorageLevel

    if unicode_form is not None:
        # canonicalize BEFORE anything reads the text: every dedup
        # grain hashes content, and composed-vs-decomposed sequences
        # must collide (see text.normalize_unicode)
        from .text import normalize_unicode

        docs = normalize_unicode(docs, form=unicode_form,
                                 text_col=text_col)

    def _persist(df: DataFrame, name: str) -> DataFrame:
        if catalog is not None:
            tbl = f"{checkpoint_prefix}_{name}"
            catalog.overwrite(df, tbl)
            return catalog.read(tbl)
        return df.persist(StorageLevel.MEMORY_AND_DISK) if cache else df

    spark = docs.sparkSession
    if blocked_domains is not None:
        from .text import domain_matches

        # matched on the ORIGINAL frame (the transform below does not
        # touch id/url, and matching first spares blocked docs a
        # pointless trip through the corpus-wide paragraph dedup)
        blocked = _persist(
            domain_matches(docs, blocked_domains, url_col=url_col,
                           id_col=id_col)
            .withColumn("r_domain", F.lit(True)),
            "blocked_domain")
    else:
        blocked = spark.createDataFrame([], f"{id_col} long, r_domain boolean")

    if paragraph_max_freq is not None:
        from .spans import dedup_paragraphs

        # blocked docs neither vote nor win: a keep-first winner landing
        # in a doc that the domain gate then drops would lose the
        # paragraph from the corpus entirely. They pass through with
        # ORIGINAL text (they are dropped anyway; only the audit sees it).
        survivors = docs.join(blocked.select(id_col), id_col, "left_anti")
        ddp = dedup_paragraphs(survivors, text_col=text_col, id_col=id_col,
                               max_freq=paragraph_max_freq)
        deduped = (survivors.drop(text_col)
                   .join(ddp.select(id_col,
                                    F.col("deduped_text").alias(text_col)),
                         id_col))
        docs = deduped.unionByName(
            docs.join(blocked.select(id_col), id_col, "left_semi")
            .select(*deduped.columns))

    if c4_lines:
        from .text import c4_line_filter

        c4 = c4_line_filter(docs, text_col=text_col, id_col=id_col,
                            min_words=c4_min_words)
        docs = (docs.drop(text_col)
                .join(c4.select(id_col, F.col("filtered_text")
                                .alias(text_col)), id_col))

    sig = corpus_signals(docs, text_col=text_col, id_col=id_col,
                         profiles=profiles)
    quality_reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("repetition_ratio") > max_repetition_ratio, F.lit("repetitive"))
        .when(~F.col("predicted_lang").isin(*languages), F.lit("language"))
    )
    if blocked_terms is not None:
        from .text import blocked_terms_expr

        quality_reason = quality_reason.when(
            blocked_terms_expr(blocked_terms, "text"),
            F.lit("blocked_terms"))
    tagged = _persist(sig.withColumn("q_reason", quality_reason), "tagged")
    clean = tagged.filter(F.col("q_reason").isNull())
    if blocked_domains is not None:
        clean = clean.join(blocked.select(id_col), id_col, "left_anti")

    if quality_model is not None:
        from .classifier import (apply_standardization, quality_features,
                                 score_logreg)

        weights, bias, means, stds = quality_model
        feats = quality_features(clean.select(id_col, "text"),
                                 text_col="text", id_col=id_col)
        qscores = _persist(
            score_logreg(apply_standardization(feats, means, stds),
                         weights, bias, id_col=id_col),
            "quality_prob")
        clean = (clean.join(qscores, id_col)
                 .filter(F.col("quality_prob") >= min_quality_prob)
                 .drop("quality_prob"))
    else:
        qscores = spark.createDataFrame([],
                                        f"{id_col} long, quality_prob double")

    if perplexity_lm is not None:
        from .lm import perplexity as lm_perplexity
        from .lm import perplexity_ngram as lm_perplexity_ngram

        if max_perplexity is None:
            raise ValueError("perplexity_lm requires max_perplexity")
        # model kind picked off the dict keys, like perplexity_buckets —
        # a train_ngram_lm model works here too (its hot_grams skew
        # option is the scorer's own default-off knob)
        scorer = (lm_perplexity_ngram if "ngrams" in perplexity_lm
                  else lm_perplexity)
        pscores = _persist(
            scorer(clean.select(id_col, "text"), perplexity_lm,
                   text_col="text", id_col=id_col)
            .select(id_col, "perplexity"),
            "perplexity")
        # NULL perplexity = no bigram evidence; kept (tag-don't-filter:
        # absence of evidence is not evidence of junk)
        clean = (clean.join(pscores, id_col, "left")
                 .filter(F.col("perplexity").isNull()
                         | (F.col("perplexity") <= max_perplexity))
                 .drop("perplexity"))
    else:
        pscores = spark.createDataFrame([],
                                        f"{id_col} long, perplexity double")

    # exact dedup over quality survivors: losers = docs whose id is not
    # the keeper of their identical-text group. Keeper map via
    # hash-groupBy + equi-join back on the hash — NOT collect_list of
    # ids per group, which turns a million identical docs into one
    # giant row; the join row count equals the corpus either way and
    # every stage stays bounded. The loser set is a subset of the
    # corpus (usually small) -> equi-joins below broadcast under AQE.
    hashed = clean.select(F.col(id_col), F.md5(F.col("text")).alias("h"))
    keepers = hashed.groupBy("h").agg(F.min(id_col).alias("kept"))
    exact_losers = _persist(
        hashed.join(keepers, "h")
        .filter(F.col(id_col) != F.col("kept"))
        .select(id_col)
        .withColumn("r_exact", F.lit(True)),
        "exact_losers",
    )
    exact_kept = clean.join(exact_losers.select(id_col), id_col, "left_anti")

    # near-dedup over exact survivors: LSH band buckets -> connected
    # components -> keep the smallest id per cluster.
    # exact dedup already removed identical texts above, so buckets past
    # max_bucket_size here are near-identical spam clusters — the cap
    # bounds their pair explosion (see lsh_pairs_from_buckets)
    pairs = minhash_lsh_pairs(exact_kept, text_col="text", id_col=id_col,
                              k=shingle_k, num_hashes=num_hashes,
                              bands=bands, fast=fast,
                              max_bucket_size=max_bucket_size)
    near_losers = _persist(
        # auto: driver union-find below the edge gate (the LSH cap
        # bounds pair counts), distributed star above — see
        # llm.dedup.neardup_clusters
        neardup_clusters(pairs, algorithm="auto")
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select(F.col("doc_id").alias(id_col))
        .withColumn("r_near", F.lit(True)),
        "near_losers",
    )
    near_kept = exact_kept.join(near_losers.select(id_col), id_col, "left_anti")

    if benchmark is not None:
        from .text import decontaminate

        bench_clean = corpus_signals(benchmark, text_col=text_col,
                                     id_col=id_col, profiles=profiles)
        dec = decontaminate(near_kept, bench_clean, text_col="text",
                            id_col=id_col, k=shingle_k,
                            min_overlap_frac=min_overlap_frac)
        if min_overlap_frac is None:  # strict mode carries no fraction
            dec = dec.withColumn("overlap_frac",
                                 F.lit(None).cast("double"))
        contaminated = _persist(
            dec.filter(F.col("contaminated"))
            .select(id_col, "overlap_frac")
            .withColumn("r_contam", F.lit(True)),
            "contaminated",
        )
    else:
        contaminated = spark.createDataFrame(
            [], f"{id_col} long, overlap_frac double, r_contam boolean")

    if mixture_rates is not None:
        from .text import mixture_keep_expr

        if source_col not in docs.columns:
            raise ValueError(
                f"mixture_rates needs a {source_col!r} column on the input")
        mixture_losers = (
            docs.select(id_col, source_col)
            .filter(~mixture_keep_expr(mixture_rates, source_col=source_col,
                                       id_col=id_col,
                                       default_rate=default_mixture_rate))
            .select(id_col).withColumn("r_mixture", F.lit(True)))
    else:
        mixture_losers = spark.createDataFrame(
            [], f"{id_col} long, r_mixture boolean")

    if dsir is not None:
        from .lm import (dsir_grams, dsir_importance_weights, dsir_select,
                         train_hashed_ngram_dist)

        dsir_target, dsir_n = dsir
        # candidate pool = survivors of EVERY earlier decision: a doc
        # another stage dropped must not occupy a selection slot, and
        # the raw distribution is DSIR's q(x) over the actual pool
        pool = _persist(
            near_kept
            .join(contaminated.select(id_col), id_col, "left_anti")
            .join(mixture_losers.select(id_col), id_col, "left_anti")
            .select(id_col, "text"),
            "dsir_pool")
        grams = _persist(
            dsir_grams(pool, text_col="text", id_col=id_col,
                       buckets=dsir_buckets, fast=fast),
            "dsir_grams")
        tdist = train_hashed_ngram_dist(
            dsir_target, text_col=text_col, id_col=id_col,
            buckets=dsir_buckets, fast=fast)
        rdist = train_hashed_ngram_dist(
            pool, id_col=id_col, buckets=dsir_buckets, fast=fast,
            grams=grams)
        dscores = _persist(
            dsir_importance_weights(pool, tdist, rdist, text_col="text",
                                    id_col=id_col, fast=fast, grams=grams)
            .select(id_col, F.col("logweight").alias("dsir_logweight")),
            "dsir_weights")
        if isinstance(dsir_n, float):
            if not 0.0 <= dsir_n <= 1.0:
                raise ValueError(
                    f"dsir fraction must be in [0, 1], got {dsir_n}")
            import math
            dsir_n = math.ceil(dsir_n * pool.count())
        selected = dsir_select(
            pool.select(id_col),
            dscores.select(id_col,
                           F.col("dsir_logweight").alias("logweight")),
            int(dsir_n), id_col=id_col, temperature=dsir_temperature,
            seed=dsir_seed)
        dsir_losers = (pool.select(id_col)
                       .join(selected.select(id_col), id_col, "left_anti")
                       .withColumn("r_dsir", F.lit(True)))
    else:
        dsir_losers = spark.createDataFrame(
            [], f"{id_col} long, r_dsir boolean")
        dscores = spark.createDataFrame(
            [], f"{id_col} long, dsir_logweight double")

    reason_cols = [F.when(F.col("r_domain"), F.lit("blocked_domain")),
                   F.col("q_reason")]
    if quality_model is not None:
        reason_cols.append(
            F.when(F.col("quality_prob") < F.lit(min_quality_prob),
                   F.lit("low_quality")))
    if perplexity_lm is not None:
        reason_cols.append(
            F.when(F.col("perplexity") > F.lit(max_perplexity),
                   F.lit("high_perplexity")))
    reason_cols += [
        F.when(F.col("r_exact"), F.lit("exact_dup")),
        F.when(F.col("r_near"), F.lit("near_dup")),
        F.when(F.col("r_contam"), F.lit("contaminated")),
        F.when(F.col("r_mixture"), F.lit("mixture_sampled")),
        F.when(F.col("r_dsir"), F.lit("dsir_resampled")),
    ]
    audit = (
        tagged
        .join(blocked, id_col, "left")
        .join(qscores, id_col, "left")
        .join(pscores, id_col, "left")
        .join(exact_losers, id_col, "left")
        .join(near_losers, id_col, "left")
        .join(contaminated, id_col, "left")
        .join(mixture_losers, id_col, "left")
        .join(dscores, id_col, "left")
        .join(dsir_losers, id_col, "left")
        .select(
            id_col, "text", "n_tokens", "repetition_ratio", "predicted_lang",
            "quality_prob", "perplexity", "overlap_frac", "dsir_logweight",
            F.coalesce(*reason_cols).alias("drop_reason"),
        )
    )
    corpus = (
        audit.filter(F.col("drop_reason").isNull())
        .select(id_col, "text", "n_tokens", "predicted_lang",
                *train_split_cols(id_col, train_pct))
    )
    return corpus, audit


def export_training_shards(corpus: DataFrame, path: str, *,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           target_tokens: int | None = None,
                           docs_per_shard: int = 50_000,
                           compression: str | None = "gzip",
                           seed: str = "shuffle-v1") -> DataFrame:
    """The SHIP-IT step after :func:`prepare_training_corpus`: order the
    corpus by the deterministic shuffle, optionally assign token-budget
    pack ids, write uniformly-sized JSONL shards, and return the ONE-ROW
    export receipt (shards, docs, tokens, order-independent corpus
    checksum from :func:`text.corpus_manifest`) to store next to the
    data card.

    ``target_tokens`` switches on :func:`text.pack_documents` (packing
    by whitespace token counts; for tokenizer-true budgets pre-compute
    ``n_bpe_tokens``/``n_unigram_tokens`` and pack yourself) — every doc
    then carries ``pack_id`` + ``shuffle_pos`` so the trainer can
    re-group shards into sequences without another shuffle. Without it,
    docs still carry ``shuffle_pos`` (epoch-stable order). Determinism
    end to end: same corpus + seed → same shard contents and the same
    receipt checksum on any cluster or partitioning (shard FILE
    boundaries are the round-robin repartition's and are not part of
    the contract — the checksum is order-independent by construction).
    """
    from ..sources.jsonl import write_jsonl_sharded
    from .text import corpus_manifest, pack_documents, shuffle_rank

    if target_tokens is not None:
        from .text import tokens as _tokens

        weighted = corpus.withColumn("__n_tok", F.size(_tokens(text_col)))
        plan = pack_documents(weighted, text_col=text_col, id_col=id_col,
                              target_chars=target_tokens,
                              weight_col="__n_tok", seed=seed)
        out = (corpus.join(plan.select(id_col, "shuffle_pos", "pack_id"),
                           id_col))
    else:
        out = corpus.join(
            shuffle_rank(corpus, id_col=id_col, seed=seed)
            .select(id_col, "shuffle_pos"), id_col)

    n = out.count()
    shards = write_jsonl_sharded(out, path, docs_per_shard=docs_per_shard,
                                 compression=compression, known_count=n)
    return (corpus_manifest(corpus, text_col=text_col, id_col=id_col)
            .withColumn("n_shards", F.lit(shards))
            .withColumn("packed", F.lit(target_tokens is not None)))


def data_card(corpus: DataFrame, audit: DataFrame | None = None, *,
              text_col: str = "text", id_col: str = "doc_id",
              source_col: str | None = None,
              lang_col: str | None = "predicted_lang",
              approximate: bool = False) -> DataFrame:
    """The dataset documentation artifact (Gebru et al. 2021
    "Datasheets for Datasets" lineage) as ONE tidy ``(section, metric,
    value)`` frame — sizes and checksum from
    :func:`text.corpus_manifest`, language/source composition, token
    percentiles, and (when the pipeline ``audit`` frame is passed) the
    per-reason attrition — ready to write next to the corpus as its
    release receipt.

    Everything is derived from existing single-aggregate operators;
    section frames are tiny (one row per metric), unioned driver-free.
    ``approximate=True`` switches the token percentiles to the
    bounded-memory Greenwald-Khanna aggregate (the 100 TB path).
    ``value`` is a STRING column so heterogeneous metrics share one
    schema; numeric consumers should go to the underlying operators.
    """
    def rows(section: str, kv: DataFrame) -> DataFrame:
        return kv.select(F.lit(section).alias("section"),
                         F.col("metric"), F.col("value").cast("string"))

    from .text import corpus_manifest, tokens as _tokens

    man = corpus_manifest(corpus, text_col=text_col, id_col=id_col)
    size = rows("size", man.selectExpr(
        "stack(5, 'n_docs', CAST(n_docs AS STRING), "
        "'n_distinct_ids', CAST(n_distinct_ids AS STRING), "
        "'n_chars', CAST(n_chars_measured AS STRING), "
        "'n_tokens', CAST(n_tokens AS STRING), "
        "'corpus_checksum', CAST(corpus_checksum AS STRING)) "
        "AS (metric, value)"))

    lens = corpus.select(F.size(_tokens(text_col)).alias("n"))
    # exact percentile buffers every value in one reducer — fine for
    # profiling, the documented hazard at corpus scale (see
    # corpus_profile); approximate=True is the bounded-memory GK path
    fn = "approx_percentile" if approximate else "percentile"
    pct = rows("tokens_per_doc", lens.agg(
        F.min("n").alias("min"),
        F.expr(f"{fn}(n, 0.5)").alias("p50"),
        F.expr(f"{fn}(n, 0.9)").alias("p90"),
        F.expr(f"{fn}(n, 0.99)").alias("p99"),
        F.max("n").alias("max"),
    ).selectExpr(
        "stack(5, 'min', CAST(min AS STRING), 'p50', CAST(p50 AS STRING), "
        "'p90', CAST(p90 AS STRING), 'p99', CAST(p99 AS STRING), "
        "'max', CAST(max AS STRING)) AS (metric, value)"))

    out = size.unionByName(pct)
    for section, col in (("languages", lang_col), ("sources", source_col)):
        if col is not None and col in corpus.columns:
            comp = (corpus.groupBy(F.col(col).alias("metric"))
                    .agg(F.count("*").alias("value")))
            out = out.unionByName(rows(section, comp))
    if audit is not None:
        att = (attrition_report(audit)
               .select(F.col("stage").alias("metric"),
                       F.concat(F.col("n_docs").cast("string"),
                                F.lit(" ("),
                                F.col("fraction").cast("string"),
                                F.lit(")")).alias("value")))
        out = out.unionByName(rows("attrition", att))
    return out


def attrition_report(audit: DataFrame) -> DataFrame:
    """Per-stage attrition counts from the audit frame: one row per drop
    reason (plus 'kept'), with count and fraction of the input corpus.
    The global-total window runs over the already-aggregated stage rows
    (at most len(DROP_REASONS)+1 of them), not the corpus."""
    from pyspark.sql import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        audit.groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept"))
                      .alias("stage"))
        .agg(F.count("*").alias("n_docs"))
        .withColumn("fraction", F.round(F.col("n_docs") / total, 6))
        .orderBy(F.col("stage"))
    )
