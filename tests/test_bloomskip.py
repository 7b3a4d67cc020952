"""Bloom-filter file skipping (sources/bloomskip.py): per-file Bloom
bitmaps over a probed column, equality/IN-list queries answered from
possibly-containing files only. Same contract discipline as the zone
map tests: result equality against the unpruned read FIRST, then that
files were actually skipped; no false negatives ever."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from apsviz_timeseriesdb_ingest_spark.sources.bloomskip import (
    build_bloom_skip,
    collect_bloom,
    prune_files_bloom,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
    list_parquet_files,
    read_pruned,
)
from apsviz_timeseriesdb_ingest_spark.testdata import load_table


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def docs_hashed(spark, sf_small, tmp_path):
    """documents hash-sharded by doc_id — the layout where zone maps
    are USELESS for a point lookup (every file spans the id domain)
    and a Bloom filter is the only thing that can skip files."""
    path = str(tmp_path / "docs_hashed")
    (load_table(spark, sf_small, "documents")
     .repartition(8, "doc_id")
     .write.parquet(path))
    return path


def test_equality_probe_preserves_results_and_skips(spark, docs_hashed):
    files = list_parquet_files(docs_hashed)
    assert len(files) == 8
    bl = collect_bloom(spark, docs_hashed, ["doc_id", "source"])
    assert bl.filter(F.col("column") == "doc_id") \
             .filter(~F.col("has_bloom")).count() == 0

    probe = [r.doc_id for r in (spark.read.parquet(docs_hashed)
                                .select("doc_id").limit(3).collect())]
    pred = F.col("doc_id").isin(probe)
    expect = sorted(r.doc_id for r in spark.read.parquet(docs_hashed)
                    .filter(pred).select("doc_id").collect())
    keep = prune_files_bloom(bl, "doc_id", probe)
    # 3 ids hash-sharded over 8 files: at most 3 true files (+ rare FPs)
    assert 0 < len(keep) < len(files)
    got = sorted(r.doc_id for r in read_pruned(spark, docs_hashed, keep)
                 .filter(pred).select("doc_id").collect())
    assert got == expect and len(got) == len(probe)


def test_no_false_negatives_for_every_value(spark, docs_hashed):
    """Every (file, value) pair must survive its own probe — bits are
    only set, never cleared, so this is the hard guarantee."""
    bl = collect_bloom(spark, docs_hashed, ["doc_id"]).cache()
    rows = (spark.read.parquet(docs_hashed)
            .select("doc_id", F.input_file_name().alias("f"))
            .sample(0.05, seed=7).collect())
    assert rows
    for r in rows[:40]:
        keep = prune_files_bloom(bl, "doc_id", [r.doc_id])
        assert any(r.f.endswith(k.split("/")[-1]) for k in keep), r
    bl.unpersist()


def test_missing_column_and_overfull_files_kept(spark, tmp_path):
    """Bloom-less rows (missing column, distinct count past the
    geometry's budget) are kept conservatively."""
    p1 = str(tmp_path / "t" / "a.parquet")
    p2 = str(tmp_path / "t" / "b.parquet")
    spark.range(0, 50).select(F.col("id").alias("k")) \
        .coalesce(1).write.parquet(str(tmp_path / "t1"))
    spark.range(1000, 1050).select(F.col("id").alias("other")) \
        .coalesce(1).write.parquet(str(tmp_path / "t2"))
    import os
    import shutil
    os.makedirs(str(tmp_path / "t"))
    shutil.copy([f for f in list_parquet_files(str(tmp_path / "t1"))][0], p1)
    shutil.copy([f for f in list_parquet_files(str(tmp_path / "t2"))][0], p2)

    # n_bits=128 → cap 12 distinct; file a has 50 → has_bloom False
    bl = collect_bloom(spark, str(tmp_path / "t"), ["k"], n_bits=128)
    stats = {r.file: r for r in bl.collect()}
    assert stats[p1].has_bloom is False  # overfull
    assert stats[p2].has_bloom is False  # column missing
    keep = prune_files_bloom(bl, "k", [9999])
    assert keep == sorted([p1, p2])  # nothing provably skippable


def test_string_column_and_catalog_probe_many(spark, catalog, sf_small,
                                              tmp_path):
    """String items hash identically build/probe side; the persisted
    table answers many probes with no footer or data access."""
    path = str(tmp_path / "cust")
    (load_table(spark, sf_small, "customer")
     .repartition(6, "c_custkey").write.parquet(path))
    n = build_bloom_skip(catalog, path, ["c_mktsegment", "c_name"],
                         table="cust_bloom")
    assert n == len(list_parquet_files(path))
    bl = catalog.read("cust_bloom")

    # every file holds every segment (5 distinct) → nothing skipped,
    # results intact
    keep = prune_files_bloom(bl, "c_mktsegment", ["BUILDING"])
    assert len(keep) == n

    # a single customer name lives in exactly one file
    name = (spark.read.parquet(path).select("c_name").limit(1)
            .collect()[0].c_name)
    keep = prune_files_bloom(bl, "c_name", [name])
    assert 0 < len(keep) < n
    got = (read_pruned(spark, path, keep)
           .filter(F.col("c_name") == name).count())
    assert got == 1

    # absent value: usually every file is skipped (allow rare FPs)
    keep = prune_files_bloom(bl, "c_name", ["no#such#customer"])
    assert len(keep) <= 1


def test_mixed_geometry_refused(spark, tmp_path):
    spark.range(0, 10).select(F.col("id").alias("k")) \
        .coalesce(1).write.parquet(str(tmp_path / "t"))
    a = collect_bloom(spark, str(tmp_path / "t"), ["k"], n_bits=1024)
    b = collect_bloom(spark, str(tmp_path / "t"), ["k"], n_bits=2048)
    with pytest.raises(ValueError, match="mixed bloom geometries"):
        prune_files_bloom(a.unionByName(b), "k", [1])


def test_stale_stats_keep_uncovered_files(spark, tmp_path):
    """Files appended AFTER the stats build have no bloom row; with
    path= they are kept unconditionally — a stale index must read
    more, never drop unseen data."""
    path = str(tmp_path / "grow")
    spark.range(0, 20).select(F.col("id").alias("k")) \
        .coalesce(1).write.parquet(path)
    bl = collect_bloom(spark, path, ["k"]).cache()
    bl.count()  # materialize stats BEFORE the table grows
    spark.range(100, 120).select(F.col("id").alias("k")) \
        .coalesce(1).write.mode("append").parquet(path)

    # value only in the appended file: without path= it would vanish
    keep = prune_files_bloom(bl, "k", [105], path=path)
    got = read_pruned(spark, path, keep).filter(F.col("k") == 105).count()
    assert got == 1
    # old values still prune nothing away
    keep = prune_files_bloom(bl, "k", [5], path=path)
    assert read_pruned(spark, path, keep) \
        .filter(F.col("k") == 5).count() == 1
    bl.unpersist()


def test_compacted_table_drops_dead_stats_rows(spark, tmp_path):
    """After a compaction rewrote the table, stats rows point at
    deleted files; with path= they are dropped (the replacement files
    are kept as uncovered) instead of failing the read."""
    path = str(tmp_path / "compact")
    spark.range(0, 40).select(F.col("id").alias("k")) \
        .repartition(4).write.parquet(path)
    bl = collect_bloom(spark, path, ["k"]).cache()
    bl.count()
    # materialize before overwriting the path being read
    compacted = spark.createDataFrame(spark.read.parquet(path).toPandas())
    compacted.coalesce(1).write.mode("overwrite").parquet(path)

    keep = prune_files_bloom(bl, "k", [7], path=path)
    assert keep == list_parquet_files(path)  # all-new files, all kept
    assert read_pruned(spark, path, keep) \
        .filter(F.col("k") == 7).count() == 1
    bl.unpersist()


def test_skipping_facade_end_to_end(spark, catalog, sf_small):
    """build_skipping + read_between/read_equals: identical results to
    plain filtered reads, safe against post-build appends, plain
    fallback when no stats exist."""
    from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
        build_skipping, read_between, read_equals)

    docs = load_table(spark, sf_small, "documents")
    catalog.overwrite(docs.repartition(8, "doc_id"), "docs")

    # no stats yet: plain fallback
    ids = [r.doc_id for r in docs.select("doc_id").limit(3).collect()]
    assert read_equals(catalog, "docs", "doc_id", ids).count() == len(ids)

    built = build_skipping(catalog, "docs", range_cols=["doc_id"],
                           equality_cols=["doc_id", "source"])
    assert set(built) == {"docs__zm", "docs__bloom"}

    lo = min(ids)
    expect = docs.filter(F.col("doc_id").between(lo, lo + 100)).count()
    assert read_between(catalog, "docs", "doc_id", lo,
                        lo + 100).count() == expect
    got = sorted(r.doc_id for r in
                 read_equals(catalog, "docs", "doc_id", ids)
                 .select("doc_id").collect())
    assert got == sorted(ids)

    # table grows after the build: reads stay correct (skip less)
    catalog.append(spark.createDataFrame(
        [(999_999, "late arrival", "x")],
        "doc_id long, text string, source string"), "docs")
    assert read_equals(catalog, "docs", "doc_id",
                       [999_999]).count() == 1
    assert read_between(catalog, "docs", "doc_id", 999_998,
                        1_000_000).count() == 1


def test_timestamp_column_probe(spark, tmp_path):
    """Timestamp values must hash identically on build (arrow
    scalars) and probe (python datetimes) — the regression here was
    arrow->pandas datetime64 scalars str()-rendering differently from
    the probe's fixed-width format (false negatives)."""
    import datetime as dt

    path = str(tmp_path / "ts")
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
            for i in range(48)]
    spark.createDataFrame(rows, "k long, ts timestamp_ntz") \
        .repartition(4, "k").write.parquet(path)
    bl = collect_bloom(spark, path, ["ts"])
    probe = dt.datetime(2024, 1, 2, 5, 0, 0)
    keep = prune_files_bloom(bl, "ts", [probe], path=path)
    assert read_pruned(spark, path, keep) \
        .filter(F.col("ts") == F.lit(probe)).count() == 1
    # and an absent timestamp usually skips everything
    missing = dt.datetime(2030, 6, 1, 12, 30, 45)
    assert len(prune_files_bloom(bl, "ts", [missing], path=path)) <= 1


def test_incremental_build_covers_new_and_retires_dead(spark, catalog,
                                                       tmp_path):
    """incremental=True stats a file exactly once across builds, picks
    up appended files, retires compaction-deleted rows, and refuses a
    geometry change."""
    from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
        build_skipping, read_between, read_equals)

    catalog.overwrite(spark.range(0, 40).select(F.col("id").alias("k"))
                      .repartition(4, "k"), "t")
    build_skipping(catalog, "t", range_cols=["k"], equality_cols=["k"])
    first = {r.file for r in catalog.read("t__bloom")
             .select("file").collect()}

    # append two files; incremental build must add exactly those
    catalog.append(spark.range(100, 120).select(F.col("id").alias("k"))
                   .repartition(2, "k"), "t")
    build_skipping(catalog, "t", range_cols=["k"], equality_cols=["k"],
                   incremental=True)
    bloom = catalog.read("t__bloom")
    files_now = {r.file for r in bloom.select("file").collect()}
    assert first < files_now
    assert len(files_now) == len(list_parquet_files(catalog.path("t")))
    # probes see both generations
    assert read_equals(catalog, "t", "k", [5]).count() == 1
    assert read_equals(catalog, "t", "k", [105]).count() == 1
    assert read_between(catalog, "t", "k", 100, 119).count() == 20

    # compact: incremental refresh retires every dead row
    catalog.compact("t", partitions=1)
    build_skipping(catalog, "t", range_cols=["k"], equality_cols=["k"],
                   incremental=True)
    files_now = {r.file for r in catalog.read("t__bloom")
                 .select("file").collect()}
    assert files_now == set(list_parquet_files(catalog.path("t")))
    assert read_equals(catalog, "t", "k", [105]).count() == 1

    with pytest.raises(ValueError, match="geometry"):
        build_bloom_skip(catalog, catalog.path("t"), ["k"],
                         table="t__bloom", n_bits=1024, incremental=True)
