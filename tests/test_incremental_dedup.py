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
