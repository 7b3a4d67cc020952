"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting. Everything is a built-in JVM expression — at 100 TB these
run inside whole-stage codegen with zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable_hash import md5_hash64, md5_hash_str

#: default per-language marker profiles for the n-gram/stopword heuristic
DEFAULT_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
    "zh": ("的", "是", "在", "了", "和", "有"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lower-cased text, empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Materialize the token array in its own projection: expressions
    that reference the array several times then evaluate the split+filter
    ONCE per row instead of once per reference (a ~10x difference in the
    shingling paths)."""
    return df.withColumn("__tk", tokens(text_col))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                ) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish subword
    estimate (word-boundary + digit/punct splits), char count."""
    toks = F.col("__tk")
    # RE2-compatible pattern (no lookarounds) so oracles can mirror it
    bpe_ish = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != "")
    return _with_tokens(df, text_col).select(
        id_col,
        F.length(text_col).alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(bpe_ish).alias("n_subword_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  stopwords: tuple[str, ...] = DEFAULT_LANG_PROFILES["en"],
                  ) -> DataFrame:
    """Quality signals: length, mean word length, stopword ratio,
    punctuation ratio, repetition ratio (1 - distinct/total tokens)."""
    toks = F.col("__tk")
    n = F.size(toks)
    stop = F.array([F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"]", ""))
    return _with_tokens(df, text_col).select(
        id_col,
        F.length(text_col).alias("n_chars_measured"),
        n.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(text_col, r"\s", "")) / n, 6).alias("mean_word_len"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(n_punct / F.length(text_col), 6).alias("punct_ratio"),
        F.round(F.lit(1) - F.size(F.array_distinct(toks)) / n, 6).alias("repetition_ratio"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               stopwords: tuple[str, ...] = DEFAULT_LANG_PROFILES["en"],
               ) -> DataFrame:
    """Token counting + quality signals in ONE pass: the union of
    :func:`token_stats` and :func:`quality_score` columns from a single
    projection over one materialized token array (half the scans of
    running both)."""
    toks = F.col("__tk")
    n = F.size(toks)
    bpe_ish = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != "")
    stop = F.array([F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"]", ""))
    return _with_tokens(df, text_col).select(
        id_col,
        F.length(text_col).alias("n_chars_measured"),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(bpe_ish).alias("n_subword_tokens"),
        F.round(F.length(F.regexp_replace(text_col, r"\s", "")) / n, 6).alias("mean_word_len"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(n_punct / F.length(text_col), 6).alias("punct_ratio"),
        F.round(F.lit(1) - F.size(F.array_distinct(toks)) / n, 6).alias("repetition_ratio"),
    )


#: RE2-safe PII patterns (no lookarounds — portable to DuckDB oracles).
#: Scrub order matters: emails first (they contain digits), then IPv4
#: (dotted digits would otherwise partially match the phone shape), then
#: phone-number runs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii_expr(c: Column) -> Column:
    """The PII-masking expression chain (see :data:`PII_PATTERNS`).
    Exposed as a Column builder for pipeline compositions."""
    for _, pat, mask in PII_PATTERNS:
        c = F.regexp_replace(c, pat, mask)
    return c


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              ) -> DataFrame:
    """PII scrubbing: mask emails / IPv4 addresses / phone-number runs
    with typed placeholder tokens, reporting per-class match counts
    (counted on the ORIGINAL text). Pure regexp_replace chain — codegen
    all the way; the standard pre-training redaction pass."""
    counts = [F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    return df.select(id_col, scrub_pii_expr(F.col(text_col)).alias("scrubbed_text"),
                     *counts)


def _gram_cols(n: int) -> tuple[str, str]:
    return (("top_bigram_frac", "n_bigrams") if n == 2
            else (f"top_{n}gram_frac", f"n_{n}grams"))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     *, ns: tuple[int, ...] = (2,)) -> DataFrame:
    """Gopher-style repetition signals: duplicate-line fraction (map-side,
    from the line array) and, for each order in ``ns``, the top-n-gram
    fraction (share of all token n-grams taken by the most frequent
    one — one explode + two partial aggs, shuffling only (doc, n, gram)
    counts). The Gopher paper gates on orders 2-4; the default ``(2,)``
    keeps the original two-column output shape (driver-gated).

    Per-document statistics need no corpus shuffle: each order's grams
    live in one row's array, the top-gram count is the longest run in
    the SORTED gram array (one ``array_sort`` + one fold per order),
    so the whole operator is a single map-side projection — no
    aggregate, no join, nothing keyed on the corpus.

    Docs with fewer than ``n`` tokens have NO n-grams at that order:
    the fraction is NULL and the count 0 — a truncated phantom gram
    would read every short doc as 100% repetitive and a Gopher gate
    would drop it (NULL-never-drops, like :func:`gopher_quality_stats`).
    """
    lines = F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        F.when(n_lines > 0,
               F.lit(1) - F.size(F.array_distinct(lines)) / n_lines)
        .otherwise(F.lit(0.0)), 6)
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (_with_tokens(df.repartition(par, id_col), text_col)
            .select(F.col(id_col).alias("doc"),
                    dup_line_frac.alias("dup_line_frac"), F.col("__tk")))

    def _grams_of(n: int) -> Column:
        # element_at + concat_ws (the shingles_from_tokens idiom — no
        # per-gram subarray allocation); size guard first: an
        # unguarded sequence(0, size-n) DESCENDS for short docs.
        # NOTE: transform lambdas must take ONE argument — a two-arg
        # lambda is interpreted as (element, index) by Spark.
        idx = F.when(F.size("__tk") >= n,
                     F.sequence(F.lit(0), F.size("__tk") - n)
                     ).otherwise(F.expr("CAST(array() AS array<int>)"))
        return F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__tk"), i + j + 1)
                   for j in range(n)]))

    def _max_run(sorted_grams: Column) -> Column:
        # longest run of equal adjacent values == the top gram's count
        zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                        F.lit(0).alias("best"))

        def step(acc: Column, x: Column) -> Column:
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(x.alias("prev"), run.alias("run"),
                            F.greatest(acc["best"], run).alias("best"))

        return F.aggregate(sorted_grams, zero, step, lambda acc: acc["best"])

    cols = []
    for n in ns:
        tf_name, ng_name = _gram_cols(n)
        base = base.withColumn("__g", F.array_sort(_grams_of(n)))
        total = F.size("__g")
        base = (base
                .withColumn(tf_name, F.when(
                    total > 0,
                    F.round(_max_run(F.col("__g")) / total, 6)))
                .withColumn(ng_name, total.cast("bigint"))
                .drop("__g"))
        cols += [tf_name, ng_name]
    return base.select(F.col("doc").alias(id_col), "dup_line_frac", *cols)


def language_score_cols(toks: Column, profiles: dict[str, tuple[str, ...]],
                        ) -> dict[str, Column]:
    """Per-language marker-count score expressions over a (materialized)
    token array column, keyed by language code in sorted order."""
    def marker_count(markers: tuple[str, ...]) -> Column:
        arr = F.array([F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    return {lang: marker_count(markers)
            for lang, markers in sorted(profiles.items())}


def language_pred_col(langs: list[str]) -> Column:
    """First-match when-chain over ``score_<lang>`` columns: the earliest
    language holding the max score wins — trivially mirrored as a SQL
    CASE chain."""
    pred = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                profiles: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Marker-token language ID: score = number of tokens found in each
    language's marker list; prediction = highest score, ties broken by
    language code order. Deterministic and oracle-checkable; swap the
    profiles for real char-n-gram tables in production."""
    profiles = profiles or DEFAULT_LANG_PROFILES
    scores = language_score_cols(F.col("__tk"), profiles)
    out = _with_tokens(df, text_col).select(
        id_col, *[s.alias(f"score_{lang}") for lang, s in scores.items()])
    return out.withColumn("predicted_lang", language_pred_col(sorted(profiles)))


def clean_text_expr(c: Column) -> Column:
    """The boilerplate-cleaning expression chain: strip URLs, emails,
    HTML tags, collapse whitespace, trim. RE2-compatible patterns so
    oracles can mirror. Exposed as a Column builder so pipeline
    compositions can fold it into one projection."""
    c = F.regexp_replace(c, r"https?://[^\s]+", " ")
    c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def clean_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               ) -> DataFrame:
    """Boilerplate cleaning: strip URLs, emails, HTML tags, collapse
    whitespace, trim. RE2-compatible patterns so oracles can mirror."""
    c = clean_text_expr(F.col(text_col))
    return df.select(id_col, c.alias("clean_text"),
                     F.length(c).alias("clean_chars"))


def train_split_cols(id_col: str = "doc_id", train_pct: int = 90,
                     seed: str = "split-v1") -> tuple[Column, Column]:
    """(split_bucket, split) expressions — a pure function of the id, so
    pipeline compositions fold them map-side instead of joining the
    3-column :func:`train_split` frame back on id (which would shuffle
    the corpus twice for no reason)."""
    bucket = md5_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    return (
        bucket.alias("split_bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval"))
        .alias("split"),
    )


def train_split(df: DataFrame, *, id_col: str = "doc_id", train_pct: int = 90,
                seed: str = "split-v1") -> DataFrame:
    """Deterministic hash-based train/eval split: stable across runs,
    clusters, and engines (md5-derived bucket 0-99). The assignment is a
    pure function of the id — re-running never reshuffles examples."""
    return df.select(id_col, *train_split_cols(id_col, train_pct, seed))


def weighted_sample(df: DataFrame, *, id_col: str = "doc_id",
                    weight_col: str | None = None, rate: float = 0.5,
                    seed: str = "sample-v1") -> DataFrame:
    """Deterministic (re-runnable, engine-reproducible) sampling: keep a
    document iff hash(id) lands below rate * weight. With a weight
    column (0..1 quality scores), high-quality docs survive
    proportionally more — the standard quality-weighted downsampling
    pass. Pure function of (id, weight): the same doc set survives on
    every run, cluster, and engine — unlike ``df.sample``, whose output
    depends on partitioning.

    The hash unit interval is md5-derived (portable): u = h(id)/2^60
    uniform on [0,1); keep iff u < rate * weight."""
    u = md5_hash64(F.col(id_col).cast("string"), seed=seed) / F.lit(float(2 ** 60))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return df.filter(u < F.lit(rate) * w)


def stratified_sample(df: DataFrame, strata: list[str] | str, n: int, *,
                      id_col: str = "doc_id",
                      seed: str = "strata-v1") -> DataFrame:
    """Deterministic exact-``n``-per-stratum sampling: within every
    stratum keep the ``n`` docs with the smallest md5 hash — a uniform
    random-but-reproducible choice (same set on every run, cluster, and
    engine), the eval-set/inspection-sample builder that
    ``df.sampleBy`` (rate-based, partitioning-dependent) cannot give.

    One shuffle on the strata key. The per-stratum top-n is a
    ``min_by``-style ranked window — for a HOT stratum (one group
    holding most of the corpus) that window sorts the stratum in one
    task; at that skew use rate-based :func:`weighted_sample` /
    :func:`corpus_mixture` instead, or pre-filter with an approximate
    per-stratum rate and finish exactly on the survivors.
    """
    from pyspark.sql import Window

    keys = [strata] if isinstance(strata, str) else list(strata)
    u = md5_hash64(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy(*keys).orderBy(u.asc(), F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def corpus_mixture(df: DataFrame, rates: dict[str, float], *,
                   source_col: str = "source", id_col: str = "doc_id",
                   default_rate: float = 1.0,
                   seed: str = "mixture-v1") -> DataFrame:
    """Deterministic source-weighted corpus mixing: keep each document
    with its source's sampling rate — the domain-reweighting step every
    pretraining mix runs (downsample the web crawl, keep curated
    sources whole). Same md5 unit-interval primitive as
    :func:`weighted_sample` / :func:`train_split`: a pure function of
    (id, source), so the surviving set is identical on every run,
    cluster, and engine, and INDEPENDENT of the train/eval split hash
    (different seeds). Map-side only — the rate lookup folds into a
    CASE expression, no join.

    ``rates`` maps source value -> keep probability in [0, 1]; sources
    absent from the map use ``default_rate``. Rates above 1 are
    clamped: upsampling means REPEATING examples, which is an epoch
    schedule concern, not a filter — do it downstream with an explode
    on a repeat count.
    """
    return df.filter(mixture_keep_expr(
        rates, source_col=source_col, id_col=id_col,
        default_rate=default_rate, seed=seed))


def repeat_for_epochs(df: DataFrame, epochs: dict[str, float], *,
                      source_col: str = "source", id_col: str = "doc_id",
                      default_epochs: float = 1.0,
                      seed: str = "epochs-v1") -> DataFrame:
    """UPSAMPLING counterpart of :func:`corpus_mixture`: repeat every
    document its source's (possibly fractional) epoch count — the "see
    curated sources 3.4 times per crawl epoch" schedule of published
    pretraining mixes. A doc with epoch weight e appears ``floor(e)``
    times plus one more with probability ``frac(e)``, decided by the
    same md5 unit-interval primitive (pure function of the id, distinct
    seed — independent of the mixture/split hashes), so the replicated
    corpus is identical on every run and engine and expected copies
    per source equal e exactly.

    Output adds an ``epoch`` column (0-based copy index, part of the
    effective key downstream shufflers/packers should include). The
    expansion is one map-side Generate — no shuffle, no Python;
    weights below 1 are a *sampling* concern: use
    :func:`corpus_mixture` (this function floors at one copy only when
    the fractional draw keeps it, i.e. e<1 behaves like mixture).
    """
    u = md5_hash64(F.col(id_col).cast("string"), seed=seed) / F.lit(float(2 ** 60))
    e = F.lit(float(default_epochs))
    for src, r in sorted(epochs.items()):
        e = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(e)
    n = (F.floor(e) + F.when(u < e - F.floor(e), F.lit(1))
         .otherwise(F.lit(0))).cast("int")
    return (df.withColumn("__n_copies", n)
            .filter(F.col("__n_copies") >= 1)
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), F.col("__n_copies") - 1)))
            .drop("__n_copies"))


def mixture_keep_expr(rates: dict[str, float], *,
                      source_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 1.0,
                      seed: str = "mixture-v1") -> Column:
    """The boolean keep decision of :func:`corpus_mixture` as a bare
    expression — for tag-don't-filter pipelines and audit frames that
    want the decision as a COLUMN next to other per-doc signals rather
    than an applied filter."""
    u = md5_hash64(F.col(id_col).cast("string"), seed=seed) / F.lit(float(2 ** 60))
    rate = F.lit(min(1.0, float(default_rate)))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src,
                      F.lit(min(1.0, float(r)))).otherwise(rate)
    return u < rate


def vocabulary(df: DataFrame, text_col: str = "text", *, min_count: int = 1,
               ) -> DataFrame:
    """Corpus vocabulary with term counts and document frequency — two
    partial-agg shuffles on the token, no driver-side state."""
    per_doc = (df.select(F.explode(F.array_distinct(tokens(text_col))).alias("token"))
               .groupBy("token").agg(F.count("*").alias("doc_freq")))
    counts = (df.select(F.explode(tokens(text_col)).alias("token"))
              .groupBy("token").agg(F.count("*").alias("term_count")))
    return (counts.join(per_doc, "token")
            .filter(F.col("term_count") >= min_count))


def corpus_profile(df: DataFrame, text_col: str = "text",
                   group_col: str = "source", *,
                   approximate: bool = False,
                   accuracy: int = 10_000) -> DataFrame:
    """Per-group corpus statistics: doc/token/char totals, mean and
    token-count percentiles (p50/p90/p99).

    Default: EXACT percentiles (linear interpolation — the convention
    DuckDB's ``quantile_cont`` shares, so the operator is
    oracle-checkable). The exact aggregate buffers every group's values
    in the reducer — fine for profiling jobs, a scale hazard for
    billions of rows per group. ``approximate=True`` is the 100 TB
    path: ``percentile_approx`` (Greenwald-Khanna, bounded memory,
    rank error ≤ 1/``accuracy``) with the same output schema; no exact
    oracle, so the driver-gated form stays exact."""
    base = df.select(F.col(group_col).alias("grp"),
                     F.size(tokens(text_col)).alias("n_tokens"),
                     F.length(text_col).alias("n_chars"))
    if approximate:
        def pct(q: float, name: str):
            return F.round(F.percentile_approx(
                "n_tokens", q, accuracy).cast("double"), 6).alias(name)
    else:
        def pct(q: float, name: str):
            return F.round(
                F.expr(f"percentile(n_tokens, {q})"), 6).alias(name)
    return (
        base.groupBy(F.col("grp").alias(group_col))
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
             pct(0.5, "p50_tokens"),
             pct(0.9, "p90_tokens"),
             pct(0.99, "p99_tokens"),
             F.sum("n_chars").alias("total_chars"))
    )


def composition_drift(a: DataFrame, b: DataFrame, *,
                      group_col: str = "source") -> DataFrame:
    """Composition drift between two corpus snapshots (yesterday's
    crawl vs today's, pre- vs post-filter): per-group document
    fractions side by side with each group's Jensen-Shannon divergence
    term — ``sum(js_term)`` over the result IS the JS divergence (in
    nats, 0 = identical mix, ln 2 = disjoint), so the drift monitor is
    one more tiny aggregate away. Groups missing on either side appear
    with a zero fraction (their JS term is the one-sided limit; 0·ln0
    terms are dropped exactly).

    Two group-count aggregates + one outer join over GROUP-cardinality
    frames — corpus-sized work is only the two counts.
    """
    ca = (a.groupBy(F.col(group_col).alias("grp"))
          .agg(F.count("*").alias("n_a")))
    cb = (b.groupBy(F.col(group_col).alias("grp"))
          .agg(F.count("*").alias("n_b")))
    j = (ca.join(cb, "grp", "full")
         .select("grp", F.coalesce("n_a", F.lit(0)).alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).alias("n_b")))
    from pyspark.sql import Window

    w = Window.partitionBy()
    p = F.col("n_a") / F.sum("n_a").over(w)
    q = F.col("n_b") / F.sum("n_b").over(w)
    m = (p + q) / 2
    js = (F.when(F.col("n_a") > 0, p / 2 * F.log(p / m)).otherwise(F.lit(0.0))
          + F.when(F.col("n_b") > 0, q / 2 * F.log(q / m)).otherwise(F.lit(0.0)))
    return j.select(
        "grp", "n_a", "n_b",
        F.round(p, 9).alias("frac_a"),
        F.round(q, 9).alias("frac_b"),
        F.round(q - p, 9).alias("delta"),
        F.round(js, 9).alias("js_term"),
    )


def language_mix(df: DataFrame, text_col: str = "text",
                 group_col: str = "source",
                 profiles: dict[str, tuple[str, ...]] | None = None,
                 ) -> DataFrame:
    """Language composition per group: (group, predicted_lang, n_docs,
    fraction). The fraction window runs over the aggregated (group, lang)
    rows — #groups x #languages of them — not the corpus."""
    from pyspark.sql import Window

    profiles = profiles or DEFAULT_LANG_PROFILES
    scores = language_score_cols(F.col("__tk"), profiles)
    sig = (
        _with_tokens(df, text_col)
        .select(F.col(group_col).alias("grp"),
                *[s.alias(f"score_{lang}") for lang, s in scores.items()])
        .withColumn("predicted_lang", language_pred_col(sorted(profiles)))
    )
    counts = (sig.groupBy(F.col("grp").alias(group_col), "predicted_lang")
              .agg(F.count("*").alias("n_docs")))
    total = F.sum("n_docs").over(Window.partitionBy(group_col))
    return counts.withColumn(
        "fraction", F.round(F.col("n_docs") / total, 6))


def length_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   *, bucket_chars: int = 100, max_bucket: int = 8) -> DataFrame:
    """Bucket documents by character length — the partitioning most
    training pipelines use for packing/curriculum. Pure integer
    arithmetic (portable to any engine)."""
    bucket = F.least(F.floor(F.length(text_col) / bucket_chars),
                     F.lit(max_bucket)).cast("int")
    return df.select(
        id_col, F.length(text_col).alias("n_chars_measured"),
        bucket.alias("bucket"),
    )


def tf_idf_top_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     *, top_k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    tfidf = tf * ln(N / doc_freq), ranked on the ROUNDED score (6 dp)
    with a token tie-break so rankings are reproducible across engines
    and hardware. N is a metadata scalar (one count job)."""
    from pyspark.sql import Window

    n_docs = df.count()
    tf = (df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token"))
          .groupBy("doc", "token").agg(F.count("*").alias("tf")))
    dfreq = (df.select(F.explode(F.array_distinct(tokens(text_col))).alias("token"))
             .groupBy("token").agg(F.count("*").alias("doc_freq")))
    scored = (tf.join(dfreq, "token")
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6)))
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k)
            .select(F.col("doc").alias(id_col), "token", "tfidf", "rnk"))


#: minimum hash-range buckets for the distributed total-order
#: enumeration below; md5_hash64 yields 60-bit keys, so the top b bits
#: give 2^b uniform buckets.
N_ORDER_BUCKETS = 64
#: literal-offset-map comfort ceiling (2 literals per bucket in one
#: create_map — the same plan-size bound from_frame's remap uses)
_MAX_ORDER_BUCKETS = 1024


def _order_bucket_bits(df: DataFrame, order_buckets: int | None) -> int:
    """Bucket-count policy for the two-phase enumeration: the global
    order is bucket-count-INDEPENDENT (top key bits only split the
    already-ordered range), so this is purely a parallelism knob —
    default scales with the cluster (2 windows per slot) between
    ``N_ORDER_BUCKETS`` and ``_MAX_ORDER_BUCKETS``; a fixed 64 capped
    corpus-wide enumeration at 64-way parallelism (r10 — at 10^10
    rows that is the slowest stage in the pack/shuffle path). Beyond
    the literal-map ceiling, raise ``order_buckets`` explicitly and
    accept the bigger plan, or pre-shard the corpus."""
    if order_buckets is None:
        # 2 windows per slot: local[32] stays at the r9-measured 64
        # (more buckets measurably cost ~0.5 s of literal-map overhead
        # per query at sf0.1 with zero local benefit), while a
        # 1000-executor cluster (parallelism in the thousands) gets
        # the 1024 cap automatically
        par = df.sparkSession.sparkContext.defaultParallelism
        order_buckets = min(_MAX_ORDER_BUCKETS,
                            max(N_ORDER_BUCKETS, par * 2))
    return max(1, int(order_buckets) - 1).bit_length()


def _with_global_positions(df: DataFrame, id_col: str, seed: str,
                           weight: Column | None = None,
                           order_buckets: int | None = None) -> DataFrame:
    """Distributed enumeration of the deterministic (hash-key, id) total
    order — the scale-safe replacement for a partition-less
    ``Window.orderBy`` (which funnels the whole corpus through ONE task;
    r1 verdict perf-weak #4).

    Two-phase: rows hash-range-bucket on the top bits of the order key
    (uniform by construction, no sampling), a per-bucket window numbers
    rows within each bucket in parallel, and per-bucket offsets come from
    one tiny count/sum job (<= 2^bits rows collected). Adds
    ``shuffle_pos`` and, when a ``weight`` expression is given,
    ``__run`` = global running weight total over the same order.
    ``shuffle_pos``/``__run`` are IDENTICAL at any bucket count (the
    buckets split one fixed total order), pytest-pinned.
    """
    from pyspark.sql import Window

    bits = _order_bucket_bits(df, order_buckets)
    base = (df.withColumn("__key", md5_hash64(F.col(id_col).cast("string"), seed=seed))
            .withColumn("__bkt", F.shiftright(F.col("__key"), 60 - bits)
                        .cast("int")))
    aggs = [F.count("*").alias("cnt")]
    if weight is not None:
        # NULL weights count as 0 (a NULL-text doc occupies no budget):
        # an all-NULL bucket otherwise sums to NULL and breaks the
        # driver-side offset accumulation (hostile-corpus sweep, r4);
        # same semantics as a window SUM skipping NULLs, so the
        # llm_pack_documents oracle is unaffected
        base = base.withColumn("__wt", F.coalesce(weight, F.lit(0)))
        aggs.append(F.sum("__wt").alias("wt"))
    stats = sorted((r["__bkt"], r) for r in base.groupBy("__bkt").agg(*aggs).collect())
    pos_off: dict[int, int] = {0: 0}
    wt_off: dict[int, int] = {0: 0}
    pos = wt = 0
    for bkt, r in stats:
        pos_off[bkt] = pos
        pos += r["cnt"]
        if weight is not None:
            wt_off[bkt] = wt
            wt += r["wt"]
    w = Window.partitionBy("__bkt").orderBy("__key", id_col)
    pos_map = F.create_map(*[F.lit(x) for bkt, off in pos_off.items()
                             for x in (bkt, off)])
    out = base.withColumn(
        "shuffle_pos",
        F.element_at(pos_map, F.col("__bkt")) + F.row_number().over(w))
    if weight is not None:
        run = F.sum("__wt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wt_map = F.create_map(*[F.lit(x) for bkt, off in wt_off.items()
                                for x in (bkt, off)])
        out = out.withColumn("__run", F.element_at(wt_map, F.col("__bkt")) + run)
    return out


def shuffle_rank(df: DataFrame, *, id_col: str = "doc_id",
                 seed: str = "shuffle-v1",
                 order_buckets: int | None = None) -> DataFrame:
    """Deterministic dataset shuffle: a stable pseudo-random total order
    from the id hash. Same seed → same order on any engine/cluster —
    the reproducible replacement for rand()-based shuffles. Enumerated
    with the bucketed two-phase pass (no single-task global sort);
    ``order_buckets`` tunes only the enumeration parallelism (the
    positions are bucket-count-independent, see
    :func:`_order_bucket_bits`)."""
    return _with_global_positions(df, id_col, seed,
                                  order_buckets=order_buckets) \
        .select(id_col, "shuffle_pos")


def pack_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   *, target_chars: int = 2048, seed: str = "shuffle-v1",
                   weight_col: str | None = None,
                   order_buckets: int | None = None,
                   ) -> DataFrame:
    """Greedy sequence packing: walk docs in the deterministic shuffle
    order and cut a new pack whenever the running weight total crosses
    the target — the standard pretraining packing pass. The running total
    is the same bucketed two-phase enumeration as :func:`shuffle_rank`
    (per-bucket cumulative sums + per-bucket weight offsets), so no
    stage funnels the corpus through one task; ``shuffle_pos`` is carried
    in the output so one pass serves both operators.

    By default the weight is ``length(text_col)`` (character packing,
    output column ``n_chars_measured``). Pass ``weight_col`` to pack by
    any per-doc size — e.g. ``n_bpe_tokens`` from
    :func:`llm.bpe.bpe_encode_docs` for true token-budget packs — and
    the measured column becomes ``n_weight_measured``; ``target_chars``
    is then a weight target."""
    if weight_col is None:
        weight, measured = F.length(text_col), "n_chars_measured"
    else:
        weight, measured = F.col(weight_col), "n_weight_measured"
    out = _with_global_positions(df, id_col, seed, weight=weight,
                                 order_buckets=order_buckets)
    return out.select(
        id_col, F.col("__wt").alias(measured), "shuffle_pos",
        F.floor((F.col("__run") - 1) / target_chars).cast("int").alias("pack_id"),
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", *, max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Token-aligned sliding-window chunking: split every doc into
    windows of ``max_tokens`` whitespace tokens advancing by
    ``max_tokens - overlap`` — the standard long-document →
    context-length preparation between cleaning and packing.

    Window starts are generated per row (``sequence`` + ``filter``), the
    token slices are materialized INSIDE the transform so the explode
    drags only the chunk array, not the full token array per output row
    (the Generate trap — see CLAUDE.md perf notes). A trailing window
    whose content is entirely contained in the previous one is dropped
    (emit start s iff s == 1 or s + overlap <= n), so chunks cover every
    token exactly without a redundant tail. Zero-token docs produce no
    chunks. Original case/punctuation is preserved (chunking must not
    alter training text, unlike the lowercased analysis ``tokens``).

    Cost: one map-side expansion of ~(1 + overlap/stride)x the corpus
    text — no shuffle, no Python.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    d = (df.repartition(par, id_col)
         .select(id_col, toks.alias("__tk"))
         .withColumn("__n", F.size("__tk"))
         .filter(F.col("__n") >= 1))
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.col("__n"), F.lit(1)),
                   F.lit(stride)),
        lambda s: (s == 1) | (s + F.lit(overlap) <= F.col("__n")))
    chunks = F.transform(starts,
                         lambda s: F.slice(F.col("__tk"), s, max_tokens))
    return (d.select(id_col, F.posexplode(chunks).alias("chunk_id", "__c"))
            .select(id_col, "chunk_id",
                    F.array_join(F.col("__c"), " ").alias("chunk_text"),
                    F.size("__c").alias("n_chunk_tokens")))


def decontaminate(train: DataFrame, benchmark: DataFrame, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3,
                  min_overlap_frac: float | None = None) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing k-gram
    shingles with the benchmark set. Shingle inverted-index semi-join —
    the benchmark side is tiny and broadcasts.

    Default rule: ANY shared shingle flags (the strict form — right for
    verbatim leakage). ``min_overlap_frac`` switches to the
    fractional-overlap rule of the PaLM/GPT-4-class contamination
    analyses (public reports): a doc is contaminated only when at least
    that fraction of its DISTINCT shingles appear in the benchmark —
    tolerant of incidental phrase collisions on long documents, which
    the any-rule over-flags (the sf0.1 soak's 87% artifact). Fractional
    mode returns an extra ``overlap_frac`` column (rounded 6 dp;
    shingle-free docs carry NULL and never flag); cost adds only two
    per-doc count aggregates over the same exploded frame.
    """
    from .dedup import shingles_from_tokens

    par = train.sparkSession.sparkContext.defaultParallelism

    def shingled(d: DataFrame, out: str) -> DataFrame:
        # repartition before the CPU-bound expansion, and materialize the
        # token array first (see dedup.shingles_from_tokens)
        return (d.repartition(par, id_col)
                .select(F.col(id_col).alias(out), tokens(text_col).alias("__tk"))
                .select(out, F.explode(shingles_from_tokens(F.col("__tk"), k))
                        .alias("shingle")))

    bench_sh = F.broadcast(
        shingled(benchmark, "bench_doc").select("shingle").distinct())
    if min_overlap_frac is None:
        contaminated = (
            shingled(train, "doc")
            .join(bench_sh, "shingle", "left_semi")
            .select("doc").distinct()
        )
        return (train.select(F.col(id_col).alias("doc"))
                .join(contaminated.withColumn("contaminated", F.lit(True)),
                      "doc", "left")
                .select(F.col("doc").alias(id_col),
                        F.coalesce("contaminated", F.lit(False))
                        .alias("contaminated")))
    if not 0 < min_overlap_frac <= 1:
        raise ValueError("min_overlap_frac must be in (0, 1]")
    tsh = shingled(train, "doc").distinct()
    tot = tsh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    hit = (tsh.join(bench_sh, "shingle", "left_semi")
           .groupBy("doc").agg(F.count("*").alias("n_hit")))
    frac = F.coalesce("n_hit", F.lit(0)) / F.col("n_sh")
    return (train.select(F.col(id_col).alias("doc"))
            .join(tot, "doc", "left").join(hit, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce(frac >= min_overlap_frac, F.lit(False))
                    .alias("contaminated"),
                    F.round(frac, 6).alias("overlap_frac")))


class ShingleBloom:
    """A Bloom filter over a benchmark's k-shingles, held as ONE
    DataFrame row with an ``array<long>`` bitmap column.

    This is the large-benchmark decontamination path: the broadcast
    semi-join in :func:`decontaminate` ships every distinct benchmark
    shingle (fine for one eval set); the streaming literal-array form
    embeds them in the PLAN (recompiled per micro-batch). Both stop
    scaling when the contamination list is itself corpus-sized — 100
    benchmarks x 10^5 shingles. The Bloom bitmap is fixed-size
    (``num_bits``), built distributed (explode → bit_or aggregate; the
    driver never holds shingles), and applied as a pure map-side
    ``exists`` over each doc's shingles after a broadcast of the single
    bitmap row — no shuffle, no state, no giant literal, same plan
    shape batch or streaming.

    False-positive rate: standard (1 - e^{-j*n/m})^j with j =
    ``num_hashes``, n = distinct shingles, m = ``num_bits``. Size for
    the per-DOC probe count, not per shingle: a doc probing s shingles
    flags spuriously with probability ~s*fpp. The helper default
    (m = 32n, j = 6) gives fpp ≈ 2.5e-5 — ~2e-3 per thousand-shingle
    doc. False positives DROP clean training docs (never keep
    contaminated ones) — the safe direction for decontamination.

    Hashing is the portable md5 family (double hashing: pos_i =
    (h1 + i*h2) mod m), so the same filter is reproducible in any
    engine; ``i*h2`` stays below 2^63 for j <= 8 (h is 60-bit).
    """

    def __init__(self, frame: DataFrame, *, num_bits: int, num_hashes: int,
                 k: int):
        _check_bloom_hashes(num_hashes)
        self.frame = frame          # one row: bitmap array<long>
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.k = k

    def might_contain(self, shingle: Column, bitmap: Column) -> Column:
        """Membership expression for one shingle against the (joined-in)
        bitmap column — all ``num_hashes`` positions set."""
        h1 = md5_hash64(shingle)
        h2 = md5_hash64(shingle, seed="bloom2")
        conds = []
        for i in range(self.num_hashes):
            pos = (h1 + F.lit(i) * h2) % F.lit(self.num_bits)
            word = F.element_at(bitmap, F.floor(pos / 64).cast("int") + 1)
            bit = (pos % 64).cast("int")
            conds.append(
                F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def hit_flag(self, shingle_array: Column, bitmap: Column) -> Column:
        """True iff ANY shingle in the array might be in the filter."""
        return F.exists(shingle_array, lambda s: self.might_contain(s, bitmap))


def _check_bloom_hashes(num_hashes: int) -> None:
    """``h1 + i*h2`` with 60-bit hashes overflows bigint at i >= 9 —
    and under Spark 4 ANSI mode an overflow ABORTS the whole build or
    probe rather than wrapping. Fail loudly at construction instead."""
    if not 1 <= num_hashes <= 8:
        raise ValueError(
            f"num_hashes must be in [1, 8], got {num_hashes}: the "
            "double-hash position h1 + i*h2 (60-bit md5 halves) exceeds "
            "bigint range from the 9th probe on")


def _distinct_shingles(benchmark: DataFrame, text_col: str, k: int) -> DataFrame:
    """Distinct k-shingles of a frame as one column ``s``."""
    from .dedup import shingles_from_tokens

    return (benchmark
            .select(tokens(text_col).alias("__tk"))
            .select(F.explode(shingles_from_tokens(F.col("__tk"), k)).alias("s"))
            .distinct())


def _bloom_sparse_words(sh: DataFrame, num_bits: int,
                        num_hashes: int) -> DataFrame:
    """Sparse Bloom bitmap rows ``(w, bits)`` — only words with set bits —
    built fully distributed: shingle → explode hash positions →
    (word, bit mask) → ``bit_or`` per word. The driver never sees a
    shingle."""
    h1 = md5_hash64("s")
    h2 = md5_hash64("s", seed="bloom2")
    positions = sh.select(F.explode(F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(num_bits) for i in range(num_hashes)]
    )).alias("pos"))
    return (positions
            .select(F.floor(F.col("pos") / 64).cast("long").alias("w"),
                    F.call_function(
                        "shiftleft", F.lit(1).cast("bigint"),
                        (F.col("pos") % 64).cast("int")).alias("m"))
            .groupBy("w").agg(F.bit_or("m").alias("bits")))


def build_shingle_bloom(benchmark: DataFrame, *, text_col: str = "text",
                        k: int = 3, num_bits: int | None = None,
                        num_hashes: int = 6,
                        expected_shingles: int | None = None) -> ShingleBloom:
    """Build a :class:`ShingleBloom` from a benchmark frame of any size.

    ``num_bits`` defaults to 32x ``expected_shingles`` (fpp ~2.5e-5 at
    6 hashes — see the class docstring for the per-doc sizing math);
    ``expected_shingles`` defaults to a counted pass over the benchmark
    — pass it explicitly to skip that job. Entirely distributed: shingle
    → explode positions → (word, bit-mask) → bit_or per word → dense
    array via a map lookup over the word range; the driver holds only
    the bitmap (num_bits/64 longs).
    """
    _check_bloom_hashes(num_hashes)
    sh = _distinct_shingles(benchmark, text_col, k)
    if num_bits is None:
        if expected_shingles is None:
            expected_shingles = sh.count()
        num_bits = max(1024, 32 * expected_shingles)
    num_words = (num_bits + 63) // 64
    words = _bloom_sparse_words(sh, num_bits, num_hashes)
    # densify via range + join + sorted collect — NOT element_at over a
    # Spark map (map lookups are linear scans; num_words lookups over a
    # num_words-entry map is quadratic in the bitmap size)
    spark = benchmark.sparkSession
    frame = (spark.range(num_words).withColumnRenamed("id", "w_all")
             .join(words, F.col("w_all") == F.col("w"), "left")
             .select("w_all", F.coalesce("bits", F.lit(0).cast("bigint"))
                     .alias("bits"))
             .agg(F.array_sort(
                 F.collect_list(F.struct("w_all", "bits"))).alias("a"))
             .select(F.transform(F.col("a"), lambda s: s["bits"])
                     .alias("bitmap"))
             .localCheckpoint(eager=True))
    return ShingleBloom(frame, num_bits=num_bits, num_hashes=num_hashes, k=k)


def decontaminate_bloom(train: DataFrame, bloom: ShingleBloom, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        ) -> DataFrame:
    """Bloom-filter twin of :func:`decontaminate` — same output schema
    (id, contaminated). One broadcast of the bitmap row, then pure
    map-side evaluation; flags match the exact path up to Bloom false
    positives (extra ``contaminated=True``, never false negatives)."""
    from .dedup import shingles_from_tokens

    return (train
            .select(F.col(id_col), tokens(text_col).alias("__tk"))
            .crossJoin(F.broadcast(bloom.frame))
            .select(id_col,
                    bloom.hit_flag(
                        shingles_from_tokens(F.col("__tk"), bloom.k),
                        F.col("bitmap")).alias("contaminated")))


#: geometry sidecar for table-backed Bloom filters — read back on every
#: probe, so probe-time config drift is impossible by construction
BLOOM_TABLE_META = "num_bits long, num_hashes int, k int"


def build_shingle_bloom_table(catalog, benchmark: DataFrame, *,
                              table: str = "bench_bloom",
                              text_col: str = "text", k: int = 3,
                              num_bits: int | None = None,
                              num_hashes: int = 6,
                              expected_shingles: int | None = None) -> None:
    """Persist the benchmark Bloom bitmap as a sparse ``(w, bits)`` TABLE.

    This is the beyond-broadcast decontamination path: the one-row
    :class:`ShingleBloom` bitmap ships to every executor and hits
    Spark's ~2 GB broadcast/row ceiling around 10^9 benchmark shingles
    at the default sizing. Stored as a table, the bitmap has no size
    ceiling — only words with at least one set bit are kept (≤
    ``num_hashes``·n rows regardless of ``num_bits``, so over-sizing
    ``num_bits`` costs nothing but modulus range), and probing becomes
    an equi-join on uniformly-distributed (md5) word keys — no skew, no
    broadcast, prunable if the table is range-partitioned by ``w``.

    Geometry (``num_bits``/``num_hashes``/``k``) is pinned in a one-row
    ``{table}_meta`` sidecar and read back by
    :func:`decontaminate_bloom_table` — probe-time parameter drift (the
    silent accept-everything failure the LSH index sidecar guards
    against) cannot happen here because the probe never takes the
    parameters from the caller. A rebuild overwrites both rows and
    thereby REDEFINES the filter.
    """
    _check_bloom_hashes(num_hashes)
    sh = _distinct_shingles(benchmark, text_col, k)
    if num_bits is None:
        if expected_shingles is None:
            expected_shingles = sh.count()
        num_bits = max(1024, 32 * expected_shingles)
    catalog.overwrite(_bloom_sparse_words(sh, num_bits, num_hashes), table)
    catalog.overwrite(
        benchmark.sparkSession.createDataFrame(
            [(num_bits, num_hashes, k)], BLOOM_TABLE_META),
        f"{table}_meta")


def decontaminate_bloom_table(train: DataFrame, catalog, *,
                              table: str = "bench_bloom",
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Table-backed twin of :func:`decontaminate_bloom` — same output
    schema ``(id, contaminated)`` and the same md5 double-hash family,
    so flags are bit-identical to the broadcast variant at equal
    geometry (and match :func:`decontaminate` up to Bloom false
    positives, which only ever DROP clean docs).

    Shape: docs → shingles → ``num_hashes`` (word, bit) probe rows →
    LEFT equi-join against the sparse bitmap table (absent word = no
    bits set) → per-shingle ALL-positions-set via a duplicate-safe
    ``min(hit)`` → per-doc ANY-shingle-hit. Two aggregations plus one
    many-to-one join on uniform keys — O(docs·shingles·j) rows, never a
    function of the benchmark size, and nothing is broadcast or held on
    the driver, so this is the form that survives corpus-vs-corpus
    decontamination (100 benchmarks × 10^5 shingles and beyond).
    """
    from .dedup import shingles_from_tokens

    spark = train.sparkSession
    meta = catalog.read(f"{table}_meta").collect()[0]
    num_bits, num_hashes, k = meta.num_bits, meta.num_hashes, meta.k
    words = catalog.read(table)
    par = spark.sparkContext.defaultParallelism
    probes = (
        train.repartition(par, id_col)
        .select(F.col(id_col).alias("doc"), tokens(text_col).alias("__tk"))
        .select("doc",
                F.explode(shingles_from_tokens(F.col("__tk"), k)).alias("s"))
        .select("doc", md5_hash64("s").alias("h1"),
                md5_hash64("s", seed="bloom2").alias("h2"))
        .select("doc", "h1", "h2", F.explode(F.array(
            *[(F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(num_bits)
              for i in range(num_hashes)])).alias("pos"))
        .select("doc", "h1", "h2",
                F.floor(F.col("pos") / 64).cast("long").alias("w"),
                (F.col("pos") % 64).cast("int").alias("bit")))
    hits = (
        probes.join(words, "w", "left")
        .select("doc", "h1", "h2",
                F.coalesce(
                    F.call_function("shiftright", F.col("bits"), F.col("bit"))
                    .bitwiseAND(F.lit(1)) == 1,
                    F.lit(False)).alias("hit"))
        # min(hit): true iff EVERY probe row of this shingle hit — and
        # immune to a doc repeating a shingle (sum(hit)==j would not be)
        .groupBy("doc", "h1", "h2").agg(F.min("hit").alias("all_set"))
        .groupBy("doc").agg(F.max("all_set").alias("contaminated")))
    return (train.select(F.col(id_col).alias("doc"))
            .join(hits, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("contaminated", F.lit(False))
                    .alias("contaminated")))


def blocked_terms_expr(terms: tuple[str, ...] | list[str],
                       text_col: str = "text") -> Column:
    """TRUE when the doc's token set intersects a term blocklist — the
    C4-style "bad words" gate (Raffel et al. 2020 filter corpora
    against a public word list), as a map-side expression for
    tag-don't-filter audits. Matching is whole-token over the
    lower-cased tokenizer output (the published filter's convention;
    substring matching is a different, much noisier gate — use an
    rlike over the raw text if that is really wanted). The list folds
    into an array literal: fine for word lists (hundreds of terms);
    corpus-scale lists belong in the Bloom path."""
    return F.arrays_overlap(
        tokens(text_col),
        F.array(*[F.lit(t.lower()) for t in terms]))


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *, min_words: int = 3,
                   require_terminal: bool = True) -> DataFrame:
    """The C4 line-grain cleanup (Raffel et al. 2020, public): keep
    only lines with at least ``min_words`` words and (by default) a
    terminal-punctuation ending — the rule that strips menus, nav
    bars, and cookie banners from web text. Returns ``(id,
    filtered_text, n_lines, n_removed)`` with survivors rejoined by
    newline, original line text preserved; every input doc appears
    (tag-don't-filter: an all-removed doc comes back empty and trips
    the ``too_short`` gate downstream). Entirely map-side."""
    lines = F.split(F.col(text_col), r"\n")

    def _keep(ln: Column) -> Column:
        wc = F.size(F.filter(F.split(F.trim(ln), r"\s+"),
                             lambda w: w != ""))
        k = wc >= min_words
        if require_terminal:
            k = k & F.trim(ln).rlike(r'[.!?"”]$')
        return k

    return (df.select(id_col, lines.alias("__lines"))
            .select(id_col, "__lines",
                    F.filter(F.col("__lines"), _keep).alias("__keep"))
            .select(id_col,
                    F.array_join(F.col("__keep"), "\n")
                    .alias("filtered_text"),
                    F.size("__lines").alias("n_lines"),
                    (F.size("__lines") - F.size("__keep"))
                    .alias("n_removed")))


def gopher_quality_stats(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         stopwords: tuple[str, ...] = DEFAULT_LANG_PROFILES["en"],
                         extra: dict[str, Column] | None = None,
                         ) -> DataFrame:
    """The Gopher rule-set quality signals (Rae et al. 2021, public
    paper): per-doc ratios the published thresholds gate on, computed in
    one map-side projection (no shuffle, no Python):

    - ``mean_word_chars`` (rule: in [3, 10])
    - ``symbol_word_ratio`` — '#' plus '...' occurrences per token
      (rule: < 0.1)
    - ``bullet_line_ratio`` — non-empty lines starting with a bullet
      (rule: < 0.9); ``ellipsis_line_ratio`` — lines ending in an
      ellipsis (rule: < 0.3)
    - ``alpha_word_ratio`` — tokens containing at least one letter
      (rule: > 0.8)
    - ``stop_hits`` — distinct stopwords present (rule: >= 2)

    Ratios are NULL for token-free/line-free docs (nothing to measure —
    gate on ``n_tokens`` first). Rounded to 6 dp for engine parity.
    Use :func:`gopher_drop_reason` to fold the thresholds into a tag.

    ``extra`` appends named expressions over the INPUT columns (length
    buckets, split assignment, mixture decisions …) to the same
    map-side projection — per-doc signal suites stay one pass instead
    of joining per-signal frames back on the id.
    """
    toks = F.col("__tk")
    n_tok = F.size(toks)
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda ln: F.trim(ln) != "")
    n_lines = F.size("__ln")
    n_sym = ((F.length(text_col)
              - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit(""))))
             + (F.length(text_col)
                - F.length(F.replace(F.col(text_col), F.lit("..."),
                                     F.lit("")))) / 3)
    bullets = F.size(F.filter(
        F.col("__ln"), lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    ellipses = F.size(F.filter(
        F.col("__ln"), lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    word_chars = F.aggregate(toks, F.lit(0),
                             lambda acc, t: acc + F.length(t))
    return (_with_tokens(df, text_col)
            .withColumn("__ln", lines)
            .select(
                id_col,
                n_tok.alias("n_tokens"),
                n_lines.alias("n_lines"),
                F.when(n_tok > 0, F.round(word_chars / n_tok, 6))
                .alias("mean_word_chars"),
                F.when(n_tok > 0, F.round(n_sym / n_tok, 6))
                .alias("symbol_word_ratio"),
                F.when(n_lines > 0, F.round(bullets / n_lines, 6))
                .alias("bullet_line_ratio"),
                F.when(n_lines > 0, F.round(ellipses / n_lines, 6))
                .alias("ellipsis_line_ratio"),
                F.when(n_tok > 0, F.round(alpha / n_tok, 6))
                .alias("alpha_word_ratio"),
                F.when(n_tok > 0, F.size(F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(s) for s in stopwords]))))
                .alias("stop_hits"),
                *[expr.alias(name) for name, expr in (extra or {}).items()],
            ))


def gopher_drop_reason() -> Column:
    """The published Gopher thresholds over
    :func:`gopher_quality_stats` columns as one drop-reason expression
    (NULL = keep; first failing rule wins). NULL ratios never drop."""
    return (
        F.when((F.col("mean_word_chars") < 3)
               | (F.col("mean_word_chars") > 10), F.lit("word_length"))
        .when(F.col("symbol_word_ratio") > 0.1, F.lit("symbol_ratio"))
        .when(F.col("bullet_line_ratio") > 0.9, F.lit("bullet_lines"))
        .when(F.col("ellipsis_line_ratio") > 0.3, F.lit("ellipsis_lines"))
        .when(F.col("alpha_word_ratio") < 0.8, F.lit("non_alpha_words"))
        .when(F.col("stop_hits") < 2, F.lit("no_stopwords"))
    )


def remove_repeated_lines(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", *,
                          min_chars: int = 8) -> DataFrame:
    """WITHIN-document line dedup (the Gopher repetition cleanup, line
    grain): every line whose whitespace-collapsed lower-cased form
    already appeared EARLIER in the same document is cut; the first
    occurrence survives. Lines shorter than ``min_chars`` (normalized)
    are exempt — list bullets and headers repeat legitimately.

    Entirely map-side (no shuffle): first-occurrence detection is
    ``array_position(normalized, normalized[i]) == i`` per line —
    O(lines²) within one document, which is bounded by document length,
    never corpus size. Returns ``(id, deduped_text, n_lines,
    n_removed)`` with surviving lines joined by ``"\\n"`` verbatim.
    Cross-document repetition is :func:`spans.dedup_paragraphs`'s job.
    """
    lines = F.split(F.col(text_col), r"\n")
    norm = F.transform(
        lines, lambda ln: F.regexp_replace(F.lower(F.trim(ln)), r"\s+", " "))
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.size("__lines")),
        lambda i: (F.length(F.element_at(F.col("__norm"), i)) < min_chars)
        | (F.array_position(F.col("__norm"),
                            F.element_at(F.col("__norm"), i)) == i))
    return (df.select(id_col, lines.alias("__lines"), norm.alias("__norm"))
            .select(id_col, "__lines",
                    F.transform(keep_idx,
                                lambda i: F.element_at(F.col("__lines"), i))
                    .alias("__keep"))
            .select(id_col,
                    F.array_join(F.col("__keep"), "\n").alias("deduped_text"),
                    F.size("__lines").alias("n_lines"),
                    (F.size("__lines") - F.size("__keep"))
                    .alias("n_removed")))


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", *,
                      level: int = 6) -> DataFrame:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    information-density quality signal crawl pipelines use alongside
    the Gopher rules: machine-generated repetition compresses far below
    prose (ratio → 0), while random gibberish/base64 blobs refuse to
    compress (ratio → 1). Thresholds are corpus-specific; pair with
    :func:`corpus_profile`'s percentiles rather than hardcoding.

    zlib is deliberate: DEFLATE at a fixed ``level`` is bit-stable
    across platforms for our purposes (ratio, not bytes, is consumed),
    stdlib-only, and cheap. This is a real per-row Python stage — an
    Arrow-batched ``mapInPandas`` like the multimodal decode path, NOT
    a row-at-a-time UDF; it is the documented exception to the
    zero-UDF surface because DEFLATE has no Spark-native expression.
    Empty/NULL text yields NULL ratio (nothing to measure).
    """
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, n_bytes int, n_compressed int, "
              "compression_ratio double")

    def run(batches):
        import zlib

        for pdf in batches:
            raw = [t.encode("utf-8") if isinstance(t, str) else b""
                   for t in pdf[text_col].fillna("")]
            comp = [len(zlib.compress(b, level)) if b else None
                    for b in raw]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": [len(b) for b in raw],
                "n_compressed": [c or 0 for c in comp],
                "compression_ratio": [
                    round(c / len(b), 6) if c else None
                    for c, b in zip(comp, raw)],
            })

    par = df.sparkSession.sparkContext.defaultParallelism
    return (df.repartition(par, id_col)
            .select(id_col, text_col).mapInPandas(run, schema))


def normalize_unicode(df: DataFrame, *, form: str = "NFKC",
                      text_col: str = "text") -> DataFrame:
    """Unicode-normalize the text column in place (all other columns
    ride through) — the canonicalization step that belongs BEFORE any
    content hashing: composed vs decomposed sequences ("café" as
    ``e+\\u0301`` vs ``\\u00e9``), full-width forms, and compatibility
    characters are byte-different but visually identical, so without
    this every dedup grain (exact md5, shingles, paragraphs, URL text)
    treats them as distinct documents. NFKC is the corpus-pipeline
    default (canonical + compatibility folding); NFC preserves
    compatibility distinctions.

    Implementation note: Spark has NO native unicode normalizer, so
    this is an Arrow-batched ``mapInPandas`` over stdlib
    ``unicodedata`` — the same documented Python-boundary exception
    class as :func:`compression_ratio` and the multimodal decode
    (never a row-at-a-time UDF). NULL text stays NULL. Cost: one
    vectorized pass; apply once at ingest, before signals and dedup
    (``prepare_training_corpus(unicode_form=...)`` does exactly that).
    """
    import unicodedata

    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    schema = df.schema
    cols = list(df.columns)

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = [
                unicodedata.normalize(form, t) if isinstance(t, str)
                else t
                for t in pdf[text_col]]
            yield pdf[cols]

    return df.mapInPandas(run, schema)


def corpus_manifest(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One-row corpus manifest: doc/char/token totals, distinct-id
    count, and an ORDER-INDEPENDENT content checksum —
    ``bit_xor`` of the md5 hash of every ``id|text`` pair, so the same
    logical corpus yields the same checksum on any partitioning,
    cluster, engine, or row order (xor is commutative/associative).
    The reproducibility receipt for exactly-once pipelines: write it
    next to the corpus, re-derive after replay/compaction/migration,
    and byte-compare.
    """
    doc_hash = md5_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col(text_col)))
    return df.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.col(id_col)).alias("n_distinct_ids"),
        F.sum(F.length(text_col)).alias("n_chars_measured"),
        F.sum(F.size(tokens(text_col))).alias("n_tokens"),
        F.bit_xor(doc_hash).alias("corpus_checksum"),
    )


def url_host(url: Column | str) -> Column:
    """Normalized host of an absolute URL: lower-cased, leading ``www.``
    stripped; NULL when the URL has no parseable host. ``try_parse_url``,
    not ``parse_url``: under Spark 4 ANSI mode one malformed URL in a
    crawl would otherwise abort the whole distributed read."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


#: query parameters that never identify content — the standard
#: tracking-parameter strip list (UTM campaign tags, click ids)
TRACKING_PARAM_RE = (r"^(utm_[^=]*|fbclid|gclid|msclkid|dclid|mc_cid|"
                     r"mc_eid|ref_src|igshid)=")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for URL-grain dedup: lower-cased scheme
    and host (www. stripped), the SCHEME-MATCHING default port dropped
    (``http://h:80`` ≡ ``http://h``, ``https://h:443`` ≡ ``https://h``)
    while any non-default port stays in the canonical form (two ports
    of one host are two origins — different servers, different
    content), fragment dropped, tracking query parameters removed and
    the REST SORTED (param order is presentation, not identity),
    trailing slash trimmed from non-root paths. The port comes from
    AUTHORITY (HOST strips it, so a HOST-only parse cannot distinguish
    ports at all). NULL for unparseable URLs (``try_parse_url`` —
    plain ``parse_url`` would abort a distributed read on one bad row
    under ANSI, the CLAUDE.md rule). Pure map-side expression."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(c, F.lit("HOST"))), r"^www\.", "")
    port = F.regexp_extract(
        F.coalesce(F.try_parse_url(c, F.lit("AUTHORITY")), F.lit("")),
        r":(\d+)$", 1)
    default_port = (F.when(scheme == "http", F.lit("80"))
                    .when(scheme == "https", F.lit("443"))
                    .otherwise(F.lit("")))
    ptail = F.when((port == "") | (port == default_port), F.lit("")
                   ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.coalesce(F.try_parse_url(c, F.lit("PATH")),
                                       F.lit("")), r"/+$", "")
    query = F.try_parse_url(c, F.lit("QUERY"))
    kept = F.array_sort(F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qtail = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))
                   ).otherwise(F.lit(""))
    return F.when(scheme.isNotNull() & host.isNotNull(),
                  F.concat(scheme, F.lit("://"), host, ptail, path,
                           qtail))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-grain exact dedup (the crawl pipeline's cheapest first pass
    — recrawls and tracking-tagged links collapse before any content
    hashing): keep the lowest id per :func:`canonical_url`. Returns
    ``(canonical_url, kept_id, n_copies)`` — the ``dedup.exact_dedup``
    shape, one hash-groupBy. Unparseable URLs (NULL canonical form)
    are NOT grouped together: each keeps itself (a missing URL is no
    evidence two docs are the same)."""
    cu = canonical_url(url_col)
    grouped = (df.select(F.col(id_col), cu.alias("canonical_url"))
               .filter(F.col("canonical_url").isNotNull())
               .groupBy("canonical_url")
               .agg(F.min(id_col).alias("kept_id"),
                    F.count("*").alias("n_copies")))
    loners = (df.select(F.col(id_col), cu.alias("canonical_url"))
              .filter(F.col("canonical_url").isNull())
              .select("canonical_url", F.col(id_col).alias("kept_id"),
                      F.lit(1).cast("long").alias("n_copies")))
    return grouped.unionByName(loners)


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host (``a.b.com`` → ``[a.b.com, b.com,
    com]``) — bounded by label count, so domain-list matching becomes an
    equi-join instead of an endswith theta-join (which would be a
    BroadcastNestedLoop at corpus scale)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: F.array_join(F.slice(parts, i, n), "."))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per normalized host — the crawl-composition profile
    (``host`` NULL groups the unparseable URLs)."""
    return (df.select(url_host(url_col).alias("host"))
            .groupBy("host").agg(F.count("*").alias("n_docs")))


def domain_matches(df: DataFrame, domains: DataFrame, *,
                   url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """Ids of docs whose normalized host has ANY dot-suffix in the
    ``domains`` list (one ``domain`` column) — so ``spam.com`` also
    covers ``ads.spam.com`` — without an endswith theta-join: suffixes
    are exploded (≤ label count per doc) and equi-joined against the
    broadcast list. Docs with unparseable hosts match nothing."""
    sfx = (df.select(F.col(id_col).alias("__id"),
                     url_host(F.col(url_col)).alias("__h"))
           .filter(F.col("__h").isNotNull())
           .select("__id",
                   F.explode(_host_suffixes(F.col("__h"))).alias("domain")))
    return (sfx.join(F.broadcast(domains.select(
        F.lower(F.col("domain")).alias("domain")).distinct()),
        "domain", "left_semi")
        .select(F.col("__id").alias(id_col)).distinct())


def filter_by_domain(df: DataFrame, domains: DataFrame, *,
                     url_col: str = "url", id_col: str = "doc_id",
                     mode: str = "block") -> DataFrame:
    """Domain-list filtering (the crawl blocklist/allowlist pass) via
    :func:`domain_matches`. ``mode="block"`` anti-joins matches away;
    ``mode="allow"`` keeps ONLY matches (docs with unparseable hosts
    match nothing: kept by block, dropped by allow). All original
    columns pass through.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"unknown mode {mode!r}")
    hit = domain_matches(df, domains, url_col=url_col, id_col=id_col)
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(hit, id_col, how)


def document_fingerprint(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lower-cased text
    plus a rolling content key (md5 of the sorted distinct token set) —
    robust to reordering-only edits."""
    normalized = F.array_join(F.col("__tk"), " ")
    bag = F.array_join(F.array_sort(F.array_distinct(F.col("__tk"))), " ")
    return _with_tokens(df, text_col).select(
        id_col,
        md5_hash_str(normalized).alias("content_md5"),
        md5_hash_str(bag).alias("token_bag_md5"),
        F.length(text_col).alias("n_chars_measured"),
    )
