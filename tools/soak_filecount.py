"""Tail-latency soak for the skipping layer at REAL file counts
(r7 candidate 4, pulled into r6): a 100 TB corpus is O(10k-100k)
files, and every driver-side piece of the skipping machinery —
file listing, prune arithmetic, the incremental build's
covered-set diff — is O(#files). This measures those walls at
1k/10k files so "flat at 256 files" (soak_skipping) doesn't hide a
10k-file cliff.

Measured per file count:

- ``list_s``: plain file listing (os.walk) — the floor every
  driver-side op pays;
- ``zm_build_s`` / ``bloom_build_s``: full stats builds (footer-only
  vs column-pruned data pass), distributed over the file list;
- ``zm_incr_s``: incremental refresh after appending ``--append``
  files — must be O(new files) + the survivor semi-join, NOT a
  rebuild;
- ``zm_prune_s`` / ``bloom_probe_s``: driver/Spark arithmetic over
  the stats table for a ~0.1%-selective range / 5-id IN-list;
- ``committed_files_s``: the composed committed-read's driver-side
  file arithmetic over a half-committed ``(__batch, __writer)``
  layout at the same file count;
- ``zm_kept`` / ``bloom_kept``: files surviving the prune (the
  selectivity sanity check: pruned read == full filtered read is
  asserted, result-equality first as always).

Layouts are honest: range shards for the zone map, hash shards for
the Bloom index. Bloom geometry is shrunk to 2^12 bits (rows/file is
tiny here — the soak scales FILE COUNT, not bytes). One JSON line per
file count on stdout.

Usage: python tools/soak_filecount.py [--files 1000,10000]
                                      [--rows-per-file 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", default="1000,10000")
    ap.add_argument("--rows-per-file", type=int, default=100)
    ap.add_argument("--append", type=int, default=50)
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
        bloom_table, build_skipping, read_between, read_equals,
        zm_table)
    from apsviz_timeseriesdb_ingest_spark.sources.bloomskip import (
        prune_files_bloom)
    from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
        list_parquet_files, prune_files)

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.ui.enabled", "false")
             .appName("soak_filecount").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    for n_files in [int(x) for x in args.files.split(",")]:
        with tempfile.TemporaryDirectory() as tmp:
            catalog = Catalog(spark, tmp)
            n_rows = n_files * args.rows_per_file
            base = spark.range(n_rows).select(F.col("id").alias("k"))

            # range shards (zone-map-honest layout) in one job; hash
            # shards for bloom in another table
            (base.repartitionByRange(n_files, "k")
             .write.parquet(catalog.path("zt")))
            (base.repartition(n_files, "k")
             .write.parquet(catalog.path("bt")))

            t0 = time.time()
            files = list_parquet_files(catalog.path("zt"))
            list_s = time.time() - t0
            assert len(files) == n_files, len(files)

            t0 = time.time()
            build_skipping(catalog, "zt", range_cols=["k"])
            zm_build_s = time.time() - t0
            t0 = time.time()
            build_skipping(catalog, "bt", equality_cols=["k"],
                           n_bits=1 << 12, n_hashes=5)
            bloom_build_s = time.time() - t0

            # ~0.1%-selective range probe
            lo, hi = n_rows // 2, n_rows // 2 + n_rows // 1000
            zm = catalog.read(zm_table("zt")).cache()
            zm.count()
            t0 = time.time()
            kept = prune_files(zm, "k", lo, hi,
                               path=catalog.path("zt"))
            zm_prune_s = time.time() - t0
            expect = hi - lo + 1
            got = read_between(catalog, "zt", "k", lo, hi).count()
            assert got == expect, (got, expect)

            ids = [i * (n_rows // 7) for i in range(5)]
            bl = catalog.read(bloom_table("bt")).cache()
            bl.count()
            t0 = time.time()
            bkept = prune_files_bloom(bl, "k", ids,
                                      path=catalog.path("bt"))
            bloom_probe_s = time.time() - t0
            got = read_equals(catalog, "bt", "k", ids).count()
            assert got == len(set(ids)), got

            # committed-read composition at file-count scale: commit
            # half the batches of a (__batch, __writer) layout and time
            # the driver-side committed-file arithmetic over ALL files
            from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
                committed_files)

            n_batches = 50
            (base.withColumn("__batch", (F.col("k")
                                         % n_batches).cast("long"))
             .withColumn("__writer", F.lit("w"))
             .repartition(max(1, n_files // n_batches), "k")
             .write.partitionBy("__batch", "__writer")
             .parquet(catalog.path("ct")))
            for b in range(0, n_batches, 2):
                catalog.commit_batch("ct_commits", b, "w")
            t0 = time.time()
            cfiles = committed_files(catalog, "ct", "ct_commits")
            committed_s = time.time() - t0
            all_ct = len(list_parquet_files(catalog.path("ct")))
            assert 0 < len(cfiles) < all_ct

            # incremental refresh paid per APPEND (the auto-hook path):
            # a stats pass over the new files + the survivor semi-join
            extra = spark.range(n_rows, n_rows
                                + args.append * 10).select(
                F.col("id").alias("k"))
            t0 = time.time()
            catalog.append(extra.repartition(args.append, "k"), "zt")
            zm_incr_s = time.time() - t0
            covered = catalog.read(zm_table("zt")).count()
            assert covered == n_files + args.append, covered

            print(json.dumps({
                "files": n_files, "rows": n_rows,
                "list_s": round(list_s, 3),
                "zm_build_s": round(zm_build_s, 2),
                "bloom_build_s": round(bloom_build_s, 2),
                "zm_prune_s": round(zm_prune_s, 3),
                "zm_kept": len(kept),
                "bloom_probe_s": round(bloom_probe_s, 3),
                "bloom_kept": len(bkept),
                "zm_incr_append_s": round(zm_incr_s, 2),
                "appended_files": args.append,
                "committed_files_s": round(committed_s, 3),
                "committed_kept": len(cfiles),
                "committed_total": all_ct,
            }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
