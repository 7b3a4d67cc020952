"""Incremental MinHash-LSH dedup against a persisted index
(llm/incremental.py): the O(|increment|) production shape of the
full-corpus near-dedup — new batches probe the stored (doc, band,
bucket) frame instead of re-shingling the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.dedup import (
    minhash_band_buckets, minhash_lsh_pairs)
from apsviz_timeseriesdb_ingest_spark.llm.incremental import (
    build_dedup_index, dedup_increment)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

LSH = dict(k=2, num_hashes=8, bands=4)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "sphinx of black quartz judge my vow before dawn"),
]
# 11 = near-copy of base doc 1; 12/13 = near-copies of each other;
# 14 = genuinely new.
INCREMENT = [
    (11, "the quick brown fox jumps over the lazy dog tonight again"),
    (12, "colorless green ideas sleep furiously every single night"),
    (13, "colorless green ideas sleep furiously every single night indeed"),
    (14, "a completely unrelated document about spark shuffle partitions"),
]


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_increment_semantics(spark, catalog):
    base = _docs(spark, BASE)
    assert build_dedup_index(catalog, base, **LSH) == 3

    # Sanity: the fixture collisions hold under these LSH params.
    both = _docs(spark, BASE + INCREMENT)
    pairs = {tuple(r) for r in minhash_lsh_pairs(both, **LSH).collect()}
    assert (1, 11) in pairs and (12, 13) in pairs
    assert not any(a == 14 or b == 14 for a, b in pairs)

    accepted = dedup_increment(catalog, _docs(spark, INCREMENT), **LSH)
    got = sorted(r.doc_id for r in accepted.collect())
    # 11 rejected (corpus dup of 1); 13 rejected (in-batch dup of 12,
    # smaller id wins); 12 and 14 accepted.
    assert got == [12, 14]

    # Index extended by exactly the accepted docs.
    indexed = sorted(r.doc for r in
                     catalog.read("minhash_index").select("doc")
                     .distinct().collect())
    assert indexed == [1, 2, 3, 12, 14]


def test_increment_idempotent_rerun(spark, catalog):
    build_dedup_index(catalog, _docs(spark, BASE), **LSH)
    first = dedup_increment(catalog, _docs(spark, INCREMENT), **LSH)
    assert first.count() == 2
    # Replaying the same increment: every doc now collides with the index
    # (accepted docs are in it; rejected docs still match their originals).
    again = dedup_increment(catalog, _docs(spark, INCREMENT), **LSH)
    assert again.count() == 0
    indexed = (catalog.read("minhash_index").select("doc")
               .distinct().count())
    assert indexed == 5


def test_increment_bootstraps_empty_index(spark, catalog):
    # No index table yet: increment behaves as in-batch dedup and seeds it.
    accepted = dedup_increment(catalog, _docs(spark, INCREMENT), **LSH)
    assert sorted(r.doc_id for r in accepted.collect()) == [11, 12, 14]
    assert catalog.exists("minhash_index")


def test_accepted_evaluable_after_append(spark, catalog):
    """The returned frame must not re-probe the mutated index (lineage is
    cut): evaluating it AFTER the append still shows the accepted docs."""
    build_dedup_index(catalog, _docs(spark, BASE), **LSH)
    accepted = dedup_increment(catalog, _docs(spark, INCREMENT), **LSH)
    # Force a fresh evaluation after the index has grown.
    assert accepted.filter(F.col("doc_id") == 12).count() == 1
    assert accepted.select(F.sum("doc_id")).collect()[0][0] == 26


def test_bucket_frame_matches_pairs_contract(spark):
    """lsh_pairs_from_buckets(minhash_band_buckets(df)) ==
    minhash_lsh_pairs(df) — the refactor seam the index relies on."""
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import (
        lsh_pairs_from_buckets)
    df = _docs(spark, BASE + INCREMENT)
    via_buckets = {tuple(r) for r in lsh_pairs_from_buckets(
        minhash_band_buckets(df, **LSH)).collect()}
    direct = {tuple(r) for r in minhash_lsh_pairs(df, **LSH).collect()}
    assert via_buckets == direct


class _CrashingCatalog:
    """Delegates to a real Catalog but injects one fault: either a
    PARTIAL index-partition write (half the bucket rows land, then the
    'process dies') or a crash after the index write but before the
    commit-ledger append."""

    def __init__(self, real, *, mode):
        self._real = real
        self._mode = mode  # "partial_index" | "before_commit"

    def __getattr__(self, name):
        return getattr(self._real, name)

    def overwrite(self, df, table, *, partition_by=()):
        if self._mode == "partial_index" and "__batch" in df.columns \
                and not table.endswith("_commits"):
            half = df.filter(F.col("band") < 2)
            self._real.overwrite(half, table, partition_by=partition_by)
            raise RuntimeError("simulated crash mid index write")
        return self._real.overwrite(df, table, partition_by=partition_by)

    def append(self, df, table, *, partition_by=()):
        if self._mode == "before_commit" and table.endswith("_commits"):
            raise RuntimeError("simulated crash before ledger commit")
        return self._real.append(df, table, partition_by=partition_by)


@pytest.mark.parametrize("mode", ["partial_index", "before_commit"])
def test_txn_crash_replay_zero_recall_loss(spark, catalog, mode):
    """r3 verdict task 8: the commit-ledger protocol closes the
    partial-index-append window. Crash mid index write (partial bucket
    rows) or between index write and ledger commit; the replay with the
    same batch_id recovers to the FULLY indexed state — every accepted
    doc carries all `bands` index rows, a later near-dup is still
    rejected (zero recall loss), and a second replay is a no-op."""
    from apsviz_timeseriesdb_ingest_spark.llm.incremental import (
        commits_table,
    )
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        apply_dedup_increment_txn,
    )

    base = _docs(spark, BASE)
    assert build_dedup_index(catalog, base, stream_index=True, **LSH) == 3

    batch1 = _docs(spark, INCREMENT)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_dedup_increment_txn(_CrashingCatalog(catalog, mode=mode),
                                  batch1, 7, **LSH)
    # not committed: the crashed attempt's rows are invisible to probes
    commits = catalog.read(commits_table("minhash_index"))
    assert commits.filter(F.col("__batch") == 7).count() == 0
    if mode == "partial_index":
        partial = (catalog.read("minhash_index")
                   .filter(F.col("__batch") == 7))
        assert 0 < partial.count() < 3 * LSH["bands"]  # genuinely partial

    # restart: same batch id, healthy catalog
    apply_dedup_increment_txn(catalog, batch1, 7, **LSH)

    idx = catalog.read("minhash_index")
    accepted_b1 = (idx.filter(F.col("__batch") == 7)
                   .select("doc").distinct())
    accepted_ids = {r.doc for r in accepted_b1.collect()}
    assert accepted_ids == {12, 14}  # 11 dups base, 13 dups 12
    # ZERO recall loss: every accepted doc has ALL its band rows
    per_doc = (idx.filter(F.col("__batch") == 7)
               .groupBy("doc").count().collect())
    assert {r["count"] for r in per_doc} == {LSH["bands"]}
    assert commits_table("minhash_index") and \
        catalog.read(commits_table("minhash_index"))\
        .filter(F.col("__batch") == 7).count() == 1
    # corpus exactly-once
    corpus = catalog.read("stream_corpus")
    assert {r.doc_id for r in corpus.collect()} == {12, 14}

    # a later near-dup of a batch-7 doc is rejected (the behavior the
    # old window lost)
    batch2 = _docs(spark, [
        (21, "colorless green ideas sleep furiously every single night")])
    apply_dedup_increment_txn(catalog, batch2, 8, **LSH)
    assert catalog.read("stream_corpus").filter(
        F.col("doc_id") == 21).count() == 0

    # replaying the fully-applied batch is a no-op
    n_idx = catalog.read("minhash_index").count()
    apply_dedup_increment_txn(catalog, batch1, 7, **LSH)
    assert catalog.read("minhash_index").count() == n_idx
    assert catalog.read(commits_table("minhash_index"))\
        .filter(F.col("__batch") == 7).count() == 1


def test_txn_rejects_flat_legacy_index(spark, catalog):
    """A flat (non-__batch) index cannot distinguish committed from
    partial rows — the committed_only probe refuses it loudly instead
    of silently reopening the window."""
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        apply_dedup_increment_txn,
    )

    build_dedup_index(catalog, _docs(spark, BASE), **LSH)  # flat layout
    with pytest.raises(ValueError, match="stream_index=True"):
        apply_dedup_increment_txn(catalog, _docs(spark, INCREMENT), 1,
                                  **LSH)


def test_stream_index_rebuild_replaces_stale_batches(spark, catalog):
    """Rebuilding a stream-owned index over an existing one must fully
    REPLACE it: the partitioned overwrite runs under the session-wide
    dynamic partitionOverwriteMode, which only replaces partitions
    present in the new frame — without the pre-drop, a committed
    __batch=7 partition from the old generation survives the rebuild as
    phantom index rows that reject fresh docs (ADVICE r4, medium)."""
    import os

    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        apply_dedup_increment_txn)

    build_dedup_index(catalog, _docs(spark, BASE), stream_index=True, **LSH)
    apply_dedup_increment_txn(catalog, _docs(spark, INCREMENT), 7, **LSH)
    assert sorted(os.listdir(catalog.path("minhash_index")))[:2] == \
        ["__batch=-1", "__batch=7"]

    # rebuild over the live index from a SMALLER corpus
    assert build_dedup_index(catalog, _docs(spark, BASE[:2]),
                             stream_index=True, **LSH) == 2
    # the old generation is gone: no stale __batch=7 dir, ledger reset
    batches = [d for d in os.listdir(catalog.path("minhash_index"))
               if d.startswith("__batch=")]
    assert batches == ["__batch=-1"]
    assert [r["__batch"] for r in
            catalog.read("minhash_index_commits").collect()] == [-1]
    assert (catalog.read("minhash_index").select("doc")
            .distinct().count() == 2)

    # docs absent from the rebuilt corpus are fresh again — the phantom
    # __batch=7 rows would have rejected 12 and 14 here; 11 is still
    # rejected legitimately (near-copy of base doc 1, in the rebuild)
    apply_dedup_increment_txn(catalog, _docs(spark, INCREMENT), 8, **LSH)
    got = sorted(r.doc_id for r in
                 catalog.read("stream_corpus").collect())
    assert got == [12, 14]


def test_failed_rebuild_keeps_old_generation(spark, catalog, monkeypatch):
    """A rebuild that fails mid-job must leave the OLD index generation
    fully readable and probe-able (ADVICE r5: the previous drop-then-
    write order left NO index, no meta, and no commit ledger on any
    rebuild failure). The staged rebuild writes __staging names and
    swaps only after the job succeeds."""
    import os

    build_dedup_index(catalog, _docs(spark, BASE), **LSH)
    before = sorted(r.doc for r in catalog.read("minhash_index")
                    .select("doc").distinct().collect())

    real_overwrite = Catalog.overwrite
    calls = {"n": 0}

    def failing_overwrite(self, df, table, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected rebuild failure")
        return real_overwrite(self, df, table, **kw)

    monkeypatch.setattr(Catalog, "overwrite", failing_overwrite)
    with pytest.raises(RuntimeError, match="injected"):
        build_dedup_index(catalog, _docs(spark, BASE + INCREMENT), **LSH)
    monkeypatch.undo()

    # old generation intact: same docs, same meta, probes still work
    after = sorted(r.doc for r in catalog.read("minhash_index")
                   .select("doc").distinct().collect())
    assert after == before
    assert catalog.exists("minhash_index_meta")
    assert dedup_increment(
        catalog, _docs(spark, INCREMENT), **LSH).count() == 2
    # no staging junk left behind
    assert not any(t.endswith("__staging")
                   for t in os.listdir(catalog.warehouse))


def test_staged_rebuild_contract(spark, catalog):
    """StagedRebuild rejects undeclared table names and clears leftover
    staging dirs from a crashed previous build on entry."""
    stale = spark.createDataFrame([(1,)], "x long")
    catalog.overwrite(stale, "idx__staging")
    with catalog.staged_rebuild("idx") as stage:
        assert stage("idx") == "idx__staging"
        # entry cleared the crashed build's leftover staging dir
        assert not catalog.exists("idx__staging")
    with pytest.raises(ValueError, match="not declared"):
        with catalog.staged_rebuild("idx") as stage:
            stage("other")


def test_flat_rebuild_retires_stale_commit_ledger(spark, catalog):
    """Rebuilding FLAT over a previous stream-owned generation drops the
    now-meaningless commit ledger (probing flat with committed_only
    raises by contract; a stale ledger was disk junk)."""
    build_dedup_index(catalog, _docs(spark, BASE), stream_index=True, **LSH)
    assert catalog.exists("minhash_index_commits")
    build_dedup_index(catalog, _docs(spark, BASE), **LSH)
    assert not catalog.exists("minhash_index_commits")
    assert "__batch" not in catalog.read("minhash_index").columns


def test_concurrent_writer_fencing(spark, catalog):
    """Two writers on one commit-ledger index: the second acquirer
    fences the first, whose next batch raises LOUDLY instead of
    silently interleaving __batch partitions (the previously
    docstring-only single-writer contract)."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import (
        ConcurrentWriterError, WriterLease)
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        apply_dedup_increment_txn)

    build_dedup_index(catalog, _docs(spark, BASE), stream_index=True, **LSH)
    a = WriterLease(catalog, "minhash_index").acquire(spark)
    apply_dedup_increment_txn(catalog, _docs(spark, INCREMENT), 1,
                              lease=a, **LSH)

    b = WriterLease(catalog, "minhash_index").acquire(spark)
    apply_dedup_increment_txn(
        catalog, _docs(spark, [(20, "a wholly new doc about lease fencing "
                                    "semantics and parquet tables")]),
        2, lease=b, **LSH)

    # writer A is now fenced: its next mutation raises before touching
    # the index
    before = catalog.read("minhash_index").count()
    with pytest.raises(ConcurrentWriterError, match="fenced"):
        apply_dedup_increment_txn(
            catalog, _docs(spark, [(21, "another new doc that writer a "
                                        "must not be able to index")]),
            3, lease=a, **LSH)
    assert catalog.read("minhash_index").count() == before

    # replays of an ALREADY-COMMITTED batch stay no-ops even for a
    # fenced writer (the short-circuit precedes the lease check)
    apply_dedup_increment_txn(catalog, _docs(spark, INCREMENT), 1,
                              lease=a, **LSH)

    # a rebuild retires the lease table: both writers now fail loudly
    build_dedup_index(catalog, _docs(spark, BASE), stream_index=True, **LSH)
    with pytest.raises(ConcurrentWriterError, match="gone"):
        apply_dedup_increment_txn(
            catalog, _docs(spark, [(22, "post rebuild doc")]), 4,
            lease=b, **LSH)


def test_dedup_stream_acquires_lease(spark, catalog, tmp_path):
    """run_incremental_dedup_stream stamps the writer lease at start, so
    a later stream on the same index fences the first."""
    import os

    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_dedup_stream)

    src = tmp_path / "in"
    os.makedirs(src)
    _docs(spark, BASE).coalesce(1).write.parquet(str(src / "b0"))
    q = run_incremental_dedup_stream(
        spark, str(src / "b0"), catalog,
        checkpoint_dir=str(tmp_path / "ck"), **LSH)
    q.processAllAvailable(); q.stop()
    assert catalog.exists("minhash_index_writer")
    first = catalog.read("minhash_index_writer").collect()[0]["writer_id"]

    q2 = run_incremental_dedup_stream(
        spark, str(src / "b0"), catalog,
        checkpoint_dir=str(tmp_path / "ck2"), **LSH)
    q2.processAllAvailable(); q2.stop()
    second = catalog.read("minhash_index_writer").collect()[0]["writer_id"]
    assert second != first
