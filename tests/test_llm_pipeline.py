"""End-to-end corpus-preparation pipeline: every drop reason exercised
on a hand-built corpus, attrition accounting, determinism, and the
one-map-stage signals claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
    attrition_report,
    corpus_signals,
    prepare_training_corpus,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

EN = ("the cat sat on the mat and the dog is a friend of the cat "
      "and they walk to the park every day to see the ducks swim")


def _docs(spark):
    rows = [
        # kept: clean English prose
        (1, EN),
        (2, "a quick brown fox jumps over the lazy dog and the fox is "
            "happy to run in the field all day with the other animals"),
        # too_short after cleaning (URL stripped away)
        (3, "see https://example.com/a/b/c"),
        # repetitive: one token repeated
        (4, "spam " * 40),
        # language: French markers dominate
        (5, "le chat est dans le jardin et les oiseaux sont dans une "
            "cage et le chien est dans la maison dans une boite"),
        # exact_dup of doc 1 (same cleaned text)
        (6, EN),
        # near_dup of doc 1: one trailing word appended (high shingle
        # Jaccard; verified to collide under the default LSH family —
        # a mid-text word swap at this length happens not to)
        (7, EN + " okay"),
        # contaminated: shares shingles with the benchmark doc
        (8, "the benchmark question asks what is the capital of france "
            "and the answer to the benchmark question is paris of course"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of france and the answer is paris")],
        "doc_id long, text string")


def test_pipeline_drop_reasons(spark):
    corpus, audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark),
        min_tokens=10, max_repetition_ratio=0.5, languages=("en",))
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons == {
        1: None, 2: None,
        3: "too_short",
        4: "repetitive",
        5: "language",
        6: "exact_dup",
        7: "near_dup",
        8: "contaminated",
    }
    kept = {r.doc_id for r in corpus.collect()}
    assert kept == {1, 2}


def test_pipeline_corpus_columns_and_split(spark):
    corpus, _ = prepare_training_corpus(
        _docs(spark), None, min_tokens=10, max_repetition_ratio=0.5)
    rows = corpus.collect()
    assert set(corpus.columns) == {"doc_id", "text", "n_tokens",
                                   "predicted_lang", "split_bucket", "split"}
    for r in rows:
        assert r.split in ("train", "eval")
        assert (r.split == "train") == (r.split_bucket < 95)
        # text is the cleaned+scrubbed form: no URLs / emails survive
        assert "http" not in r.text and "@" not in r.text


def test_pipeline_no_benchmark_skips_contamination(spark):
    _, audit = prepare_training_corpus(
        _docs(spark), None, min_tokens=10, max_repetition_ratio=0.5)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons[8] is None  # doc 8 survives without a benchmark


def test_attrition_report_accounts_for_every_doc(spark):
    _, audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark),
        min_tokens=10, max_repetition_ratio=0.5)
    rep = {r.stage: (r.n_docs, r.fraction) for r in
           attrition_report(audit).collect()}
    assert sum(n for n, _ in rep.values()) == 8
    assert rep["kept"][0] == 2
    assert abs(sum(f for _, f in rep.values()) - 1.0) < 1e-6


def test_pipeline_deterministic(spark):
    a_corpus, a_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    b_corpus, b_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    assert sorted(map(tuple, a_corpus.collect())) == \
        sorted(map(tuple, b_corpus.collect()))
    assert sorted(map(tuple, a_audit.collect())) == \
        sorted(map(tuple, b_audit.collect()))


def test_pipeline_runs_on_documents_table(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    corpus, audit = prepare_training_corpus(train, bench, fast=True)
    n_in = train.count()
    assert audit.count() == n_in
    n_kept = corpus.count()
    assert 0 < n_kept <= n_in
    # audit NULL-reason count == corpus count (tag-don't-filter invariant)
    assert audit.filter(F.col("drop_reason").isNull()).count() == n_kept


def test_pipeline_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus, audit = prepare_training_corpus(empty, None)
    assert corpus.count() == 0 and audit.count() == 0
    assert attrition_report(audit).count() == 0
    # empty benchmark frame: nothing is contaminated, pipeline still runs
    docs = _docs(spark)
    c2, a2 = prepare_training_corpus(docs, empty, min_tokens=10,
                                     max_repetition_ratio=0.5)
    reasons = {r.doc_id: r.drop_reason for r in a2.collect()}
    assert reasons[8] is None


def test_corpus_signals_single_map_stage(spark):
    """The per-row signal pass must not shuffle: no exchange in the plan."""
    plan = corpus_signals(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pipeline_checkpoint_tables_match_cached(spark, tmp_path):
    """catalog= switches reused intermediates from executor cache to
    checkpoint tables (the 100 TB form) with identical results."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    a_corpus, a_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5)
    b_corpus, b_audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark), min_tokens=10,
        max_repetition_ratio=0.5, cache=False, catalog=cat)
    assert sorted(map(tuple, a_corpus.collect())) == \
        sorted(map(tuple, b_corpus.collect()))
    assert sorted(map(tuple, a_audit.collect())) == \
        sorted(map(tuple, b_audit.collect()))
    # the intermediates are real tables, inspectable after the run
    for t in ["corpus_prep_tagged", "corpus_prep_exact_losers",
              "corpus_prep_near_losers", "corpus_prep_contaminated"]:
        assert cat.exists(t)


def test_pipeline_learned_stages(spark):
    """Classifier + perplexity stages: docs failing the learned filter
    drop with their own reasons, scores land in the audit, and docs
    already dropped by heuristics never reach the learned stages."""
    from apsviz_timeseriesdb_ingest_spark.llm.classifier import (
        QUALITY_FEATURES, quality_features, standardize_stats, train_logreg)
    from apsviz_timeseriesdb_ingest_spark.llm.lm import train_bigram_lm

    docs = _docs(spark)
    dim = len(QUALITY_FEATURES)
    # weak labels off the raw docs: long docs are "quality"
    feats = quality_features(docs)
    labeled = feats.withColumn(
        "label", (F.element_at("features", 1) > 3.0).cast("double"))
    means, stds = standardize_stats(labeled, dim=dim)
    from apsviz_timeseriesdb_ingest_spark.llm.classifier import (
        apply_standardization)
    w, b = train_logreg(apply_standardization(labeled, means, stds),
                        dim=dim, iters=30, lr=1.0, l2=1e-4)

    lm = train_bigram_lm(docs.filter(F.col("doc_id").isin([1, 2])))

    corpus, audit = prepare_training_corpus(
        docs, None, min_tokens=10, max_repetition_ratio=0.5,
        quality_model=(w, b, means, stds), min_quality_prob=0.0,
        perplexity_lm=lm, max_perplexity=1e9)
    rows = {r.doc_id: r for r in audit.collect()}
    # thresholds chosen to drop nothing: heuristic reasons unchanged,
    # scores present exactly for the heuristic survivors
    assert rows[3].drop_reason == "too_short"
    assert rows[3].quality_prob is None and rows[3].perplexity is None
    for d in (1, 2, 6, 7, 8):
        assert rows[d].quality_prob is not None
        assert rows[d].perplexity is not None
    assert rows[1].drop_reason is None and rows[6].drop_reason == "exact_dup"

    # now bite: drop everything below prob 0.5 / above the in-dist
    # perplexity of doc 1 — doc 8 (benchmark-ish prose, OOV vs the
    # tiny reference LM) must fall to one of the learned reasons
    p1 = rows[1].perplexity
    corpus2, audit2 = prepare_training_corpus(
        docs, None, min_tokens=10, max_repetition_ratio=0.5,
        quality_model=(w, b, means, stds), min_quality_prob=0.5,
        perplexity_lm=lm, max_perplexity=p1 * 1.5)
    r2 = {r.doc_id: r.drop_reason for r in audit2.collect()}
    assert r2[3] == "too_short"  # heuristics still first
    assert r2[8] in ("low_quality", "high_perplexity")
    kept2 = {r.doc_id for r in corpus2.collect()}
    assert kept2 <= {1, 2, 6, 7} and 1 in kept2

    # attrition accounts for every doc with the new reasons present
    rep = {r.stage for r in attrition_report(audit2).collect()}
    assert rep <= {"kept", "too_short", "repetitive", "language",
                   "low_quality", "high_perplexity", "exact_dup",
                   "near_dup", "contaminated"}


def test_pipeline_paragraph_and_domain_stages(spark):
    boiler = "subscribe to the site newsletter for daily updates now"
    rows = [
        (1, EN + "\n\n" + boiler, "https://good.org/a"),
        (2, "a quick brown fox jumps over the lazy dog and the fox is "
            "happy to run in the field all day with other animals"
            "\n\n" + boiler, "https://fine.net/b"),
        # domain-blocked despite clean text
        (3, EN + " extra words here", "http://ads.spam.com/x"),
        # reduced to ONLY the boilerplate -> empty -> too_short
        (4, boiler, "https://ok.io/c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    blocklist = spark.createDataFrame([("spam.com",)], "domain string")
    corpus, audit = prepare_training_corpus(
        docs, None, min_tokens=10, languages=("en",),
        paragraph_max_freq=1, blocked_domains=blocklist)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    # doc 1 wins the boilerplate (smallest doc,pos); docs 2/4 lose it
    assert reasons[1] is None
    assert reasons[2] is None
    assert reasons[3] == "blocked_domain"
    assert reasons[4] == "too_short"
    texts = {r.doc_id: r.text for r in corpus.collect()}
    assert "subscribe" in texts[1]
    assert "subscribe" not in texts[2]
    # attrition accounts for every doc exactly once
    rep = {r.stage: r.n_docs for r in
           attrition_report(audit).collect()}
    assert sum(rep.values()) == len(rows)
    assert rep["blocked_domain"] == 1


def test_paragraph_winner_never_lands_in_blocked_doc(spark):
    boiler = ("a shared unique paragraph with plenty of words to keep "
              "it well above every quality threshold in the gate")
    rows = [
        # smallest (doc,pos) for the boilerplate — but domain-blocked
        (1, boiler, "http://ads.spam.com/x"),
        (2, boiler + "\n\n" + EN, "https://good.org/a"),
        (3, boiler + "\n\n" + EN + " extra tail words", "https://ok.io/b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    blocklist = spark.createDataFrame([("spam.com",)], "domain string")
    corpus, audit = prepare_training_corpus(
        docs, None, min_tokens=5, languages=("en",),
        paragraph_max_freq=1, blocked_domains=blocklist)
    texts = {r.doc_id: r.text for r in corpus.collect()}
    # doc 2 (smallest SURVIVING doc) keeps the paragraph; it is not lost
    assert any("shared unique paragraph" in t for t in texts.values())
    assert "shared unique paragraph" in texts[2]
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons[1] == "blocked_domain"


def test_pipeline_mixture_stage(spark):
    """mixture_rates downsamples by source as the LAST decision: rate-0
    sources vanish with reason mixture_sampled, rate-1 sources are
    untouched, and a doc another stage already dropped keeps the
    cheaper reason."""
    bases = [
        "the cat sat on the mat and the dog is a friend of the cat today",
        "a quick brown fox jumps over the lazy dog in the green field",
        "the train to the city leaves at noon and the station is busy",
        "she reads a book about the sea and the ships that sail on it",
        "the garden is full of roses and the bees visit them every day",
        "he cooks a big dinner for the family and they eat it together",
        "the mountain trail is steep but the view from the top is worth",
        "a band plays music in the park and the crowd claps to the beat",
    ]
    rows = [(i, t + " and so the story goes on for a while longer",
             "web") for i, t in enumerate(bases, start=1)]
    rows += [(20, "the library keeps old maps of the town and the river "
                  "and people come to study them with great care", "books"),
             (21, "spam " * 40, "web")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    corpus, audit = prepare_training_corpus(
        docs, mixture_rates={"web": 0.0}, cache=False)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    # every web doc gone; the repetitive one keeps its cheaper reason
    assert reasons[21] == "repetitive"
    assert all(reasons[i] == "mixture_sampled" for i in range(1, 9))
    # books (default rate 1.0) kept
    assert reasons[20] is None
    assert {r.doc_id for r in corpus.collect()} == {20}

    # fractional rate: deterministic subset, between the extremes
    c2, _ = prepare_training_corpus(docs, mixture_rates={"web": 0.5},
                                    cache=False)
    c3, _ = prepare_training_corpus(docs, mixture_rates={"web": 0.5},
                                    cache=False)
    ids2 = {r.doc_id for r in c2.collect()}
    assert ids2 == {r.doc_id for r in c3.collect()}
    assert 20 in ids2 and len(ids2) < 9

    # missing source column is a loud error
    import pytest
    with pytest.raises(ValueError, match="source"):
        prepare_training_corpus(docs.drop("source"),
                                mixture_rates={"web": 0.5}, cache=False)


def test_data_card(spark):
    """The release receipt: sizes/checksum, token percentiles,
    language+source composition, and attrition when the audit frame is
    supplied — one (section, metric, value) frame."""
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import data_card

    docs = _docs(spark).withColumn("source", F.lit("web"))
    corpus, audit = prepare_training_corpus(docs, _benchmark(spark), cache=False)
    corpus = corpus.withColumn("source", F.lit("web"))

    card = data_card(corpus, audit, source_col="source").collect()
    by = {(r.section, r.metric): r.value for r in card}
    n_kept = corpus.count()
    assert by[("size", "n_docs")] == str(n_kept)
    assert int(by[("size", "n_tokens")]) > 0
    assert ("size", "corpus_checksum") in by
    assert float(by[("tokens_per_doc", "p50")]) >= float(
        by[("tokens_per_doc", "min")])
    assert by[("sources", "web")] == str(n_kept)
    assert by[("languages", "en")] == str(n_kept)
    # attrition covers every input doc: kept + drops == input size
    att = {m: v for (s, m), v in by.items() if s == "attrition"}
    total = sum(int(v.split(" ")[0]) for v in att.values())
    assert total == docs.count()
    # deterministic: same corpus -> same card (incl. checksum)
    card2 = data_card(corpus, audit, source_col="source").collect()
    assert sorted(map(tuple, card)) == sorted(map(tuple, card2))
    # without audit: no attrition section, rest identical
    lean = data_card(corpus, source_col="source").collect()
    assert {r.section for r in lean} == {"size", "tokens_per_doc",
                                         "languages", "sources"}


def test_export_training_shards(spark, tmp_path):
    """Prepare → export: shards hold every doc exactly once in the
    deterministic shuffle order, pack ids are token-budget-consistent,
    and the receipt checksum matches a fresh manifest of the corpus."""
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
        export_training_shards,
    )
    from apsviz_timeseriesdb_ingest_spark.llm.text import corpus_manifest

    corpus, _ = prepare_training_corpus(
        load_table(spark, "/root/testdata/sf0.001", "documents"),
        None, fast=True)
    path = str(tmp_path / "shards")
    receipt = export_training_shards(
        corpus, path, target_tokens=256, docs_per_shard=40,
        compression=None).collect()[0]

    back = spark.read.json(path)
    assert back.count() == receipt.n_docs == corpus.count()
    assert receipt.n_shards >= 2 and receipt.packed
    # every doc exactly once, with order + pack metadata
    ids = [r.doc_id for r in back.collect()]
    assert sorted(ids) == sorted(r.doc_id for r in corpus.collect())
    rows = back.select("doc_id", "shuffle_pos", "pack_id").collect()
    assert len({r.shuffle_pos for r in rows}) == len(rows)  # total order
    # packs respect the budget: every pack below target + one doc's slack
    toks = {r.doc_id: len(r.text.split()) for r in back.collect()}
    packs: dict = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.doc_id)
    for members in packs.values():
        total = sum(toks[d] for d in members)
        biggest = max(toks[d] for d in members)
        assert total < 256 + biggest
    # receipt checksum == fresh manifest of the same corpus
    man = corpus_manifest(corpus).collect()[0]
    assert receipt.corpus_checksum == man.corpus_checksum


def test_pipeline_c4_and_blocked_terms_stages(spark):
    """c4_lines strips non-prose lines before signals (a doc reduced to
    nothing tags too_short); blocked_terms adds the C4 bad-words drop
    reason over cleaned tokens."""
    rows = [
        (1, "This is a fine long sentence that ends with punctuation "
            "and keeps enough words to pass every heuristic gate.\n"
            "Home | About | Contact"),
        (2, "Nav | Menu | Login\nCookies settings\nshort"),
        (3, "Gambling jackpot promotions are the entire topic of this "
            "long and otherwise well formed document right here."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus, audit = prepare_training_corpus(
        docs, c4_lines=True, blocked_terms=("jackpot",),
        min_tokens=5, cache=False)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    assert reasons[1] is None
    assert reasons[2] == "too_short"       # every line filtered away
    assert reasons[3] == "blocked_terms"
    kept = {r.doc_id: r.text for r in corpus.collect()}
    assert set(kept) == {1}
    assert "About" not in kept[1]          # nav line stripped


def test_pipeline_fractional_decontamination(spark):
    """min_overlap_frac relaxes the contamination stage: the
    single-phrase collision doc survives, heavy overlap still drops."""
    corpus, audit = prepare_training_corpus(
        _docs(spark), _benchmark(spark),
        min_tokens=10, max_repetition_ratio=0.5,
        min_overlap_frac=0.3, cache=False)
    reasons = {r.doc_id: r.drop_reason for r in audit.collect()}
    # doc 8 embeds most of the benchmark verbatim: still contaminated
    assert reasons[8] == "contaminated"
    # strict run agrees here (doc 8 is heavy overlap) but the stages
    # differ on light collisions — pin that with a planted doc
    rows = [(1, "what is the capital of spain is a different question "
                "inside an otherwise unrelated long prose paragraph "
                "about geography lessons and school mornings")]
    light = spark.createDataFrame(rows, "doc_id long, text string")
    _, a_strict = prepare_training_corpus(
        light, _benchmark(spark), min_tokens=5, cache=False)
    _, a_frac = prepare_training_corpus(
        light, _benchmark(spark), min_tokens=5,
        min_overlap_frac=0.3, cache=False)
    assert {r.drop_reason for r in a_strict.collect()} == {"contaminated"}
    assert {r.drop_reason for r in a_frac.collect()} == {None}


def test_data_card_approximate_percentiles(spark):
    """approximate=True keeps the schema; exact and GK agree on this
    small corpus."""
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import data_card

    docs = _docs(spark)
    exact = {(r.section, r.metric): r.value
             for r in data_card(docs).collect()}
    approx = {(r.section, r.metric): r.value
              for r in data_card(docs, approximate=True).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        if k[0] != "tokens_per_doc":
            assert exact[k] == approx[k]
    # min/max are exact in both
    for m in ("min", "max"):
        assert exact[("tokens_per_doc", m)] == approx[("tokens_per_doc", m)]


def test_pipeline_dsir_stage(spark):
    """r10: dsir=(target, n_or_frac) runs importance resampling as the
    FINAL decision — pool = survivors of every earlier stage, kept
    count == n exactly, losers tagged dsir_resampled, every pool doc
    carries dsir_logweight in the audit (tag-don't-filter), docs other
    stages dropped keep their cheaper reason and NULL score."""
    med = ["dose patient trial symptom therapy clinical care and the "
           "doctor said the patient must rest for a while now",
           "patient dose therapy trial and the clinical team walked "
           "through the symptom chart for an hour after lunch"]
    web = ["click here to buy the new phone at a great price and the "
           "shop will send a coupon to your email box today",
           "win a free holiday by entering the draw before friday and "
           "tell your friends about this amazing offer now",
           "the best deals on shoes and bags are in our spring sale "
           "so hurry while the stock lasts this weekend",
           "subscribe to our newsletter for daily offers and you will "
           "never miss a discount on games or music again",
           "this one weird trick will save you money on car cover "
           "and agents hate it so click the link to learn more",
           "flash sale on kitchen gear ends tonight so grab the pans "
           "and knives at half price while you still can",
           "download the app to track your parcel and earn points "
           "for every order you place with us this month",
           "join the rewards club today and get free shipping on "
           "your first three orders plus a welcome gift card"]
    rows = ([(i, t) for i, t in enumerate(med, start=1)]
            + [(10 + i, t) for i, t in enumerate(web)]
            + [(30, "tiny"), (31, "spam " * 40)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, "dose patient trial symptom therapy clinical doctor")],
        "doc_id long, text string")

    corpus, audit = prepare_training_corpus(
        docs, dsir=(target, 4), min_tokens=3,
        max_repetition_ratio=0.5, cache=False)
    got = {r.doc_id: r for r in audit.collect()}
    # earlier stages keep their cheaper reason and never score
    assert got[30].drop_reason == "too_short"
    assert got[31].drop_reason == "repetitive"
    assert got[30].dsir_logweight is None
    assert got[31].dsir_logweight is None
    # pool = the 10 survivors; exactly 4 kept, 6 dsir_resampled
    pool_ids = set(range(1, 3)) | set(range(10, 18))
    assert all(got[i].dsir_logweight is not None for i in pool_ids)
    kept = {i for i in pool_ids if got[i].drop_reason is None}
    dropped = {i for i in pool_ids
               if got[i].drop_reason == "dsir_resampled"}
    assert len(kept) == 4 and len(dropped) == 6
    assert kept | dropped == pool_ids
    # target-domain docs score higher and dominate the sample
    assert min(got[1].dsir_logweight, got[2].dsir_logweight) > \
        max(got[i].dsir_logweight for i in range(10, 18))
    assert {1, 2} <= kept
    assert {r.doc_id for r in corpus.collect()} == kept
    # attrition accounting: every doc exactly one bucket
    rep = {r.stage: r.n_docs for r in attrition_report(audit).collect()}
    assert rep["kept"] == 4 and rep["dsir_resampled"] == 6
    assert sum(rep.values()) == len(rows)

    # deterministic across reruns; fractional n = ceil(frac * pool)
    c2, _ = prepare_training_corpus(
        docs, dsir=(target, 4), min_tokens=3,
        max_repetition_ratio=0.5, cache=False)
    assert {r.doc_id for r in c2.collect()} == kept
    c3, a3 = prepare_training_corpus(
        docs, dsir=(target, 0.5), min_tokens=3,
        max_repetition_ratio=0.5, cache=False)
    assert c3.count() == 5  # ceil(0.5 * 10)

    import pytest
    with pytest.raises(ValueError, match="fraction"):
        prepare_training_corpus(docs, dsir=(target, 1.5), cache=False)


def test_pipeline_dsir_checkpoint_tables(spark, tmp_path):
    """r10: the DSIR stage's reused frames (pool, shared gram stream,
    weights) follow the catalog checkpoint policy like every other
    intermediate, with identical results to the pure-lazy run."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    rows = [(1, "dose patient trial symptom therapy clinical care now"),
            (2, "click here buy now free offer deal shop coupon email"),
            (3, "the train to the city leaves at noon and waits there"),
            (4, "she reads a book about the sea and the sailing ships"),
            (5, "the garden is full of roses and bees visit every day")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, "dose patient trial symptom therapy clinical")],
        "doc_id long, text string")
    cat = Catalog(spark, str(tmp_path / "wh"))
    a_corpus, a_audit = prepare_training_corpus(
        docs, dsir=(target, 2), min_tokens=3, cache=False)
    b_corpus, b_audit = prepare_training_corpus(
        docs, dsir=(target, 2), min_tokens=3, cache=False, catalog=cat)
    assert sorted(map(tuple, a_corpus.collect())) == \
        sorted(map(tuple, b_corpus.collect()))
    assert sorted(map(tuple, a_audit.collect())) == \
        sorted(map(tuple, b_audit.collect()))
    for t in ["corpus_prep_dsir_pool", "corpus_prep_dsir_grams",
              "corpus_prep_dsir_weights"]:
        assert cat.exists(t)
