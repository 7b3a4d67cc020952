"""File-skipping index scale soak: build cost and probe selectivity of
the zone map (range predicates) and the Bloom skip index (equality
probes) as the FILE COUNT grows, on the sf0.1 documents table.

What a 100 TB deployment cares about, measured:

- build wall: zonemap = footer-only distributed pass; bloom = one
  column-pruned data pass (both one-time, probe-many);
- probe wall: driver/Spark arithmetic over the stats table — should be
  ~flat in data size and linear only in #files;
- skip ratio: fraction of files NOT read for a selective predicate;
- end-to-end: pruned read+filter vs full read+filter wall.

Layouts are the honest ones: time-keyed range shards for the zone map
(`cluster_write`-shaped), hash shards for the Bloom probe (the layout
where min/max is information-free). One JSON line per (index, files)
combo on stdout.

Usage: python tools/soak_skipping.py [--sf-dir /root/testdata/sf0.1]
                                     [--files 16,64,256]
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
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--files", default="16,64,256")
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.sources.bloomskip import (
        collect_bloom, prune_files_bloom)
    from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
        collect_zonemap, list_parquet_files, prune_files, read_pruned)
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.ui.enabled", "false")
             .appName("soak_skipping").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf_dir, "documents").cache()
    n_docs = docs.count()
    ids = [r.doc_id for r in docs.select("doc_id").limit(5).collect()]

    with tempfile.TemporaryDirectory() as tmp:
        for n_files in [int(x) for x in args.files.split(",")]:
            # -- zone map on a range-sharded layout ------------------
            zpath = os.path.join(tmp, f"range_{n_files}")
            docs.repartitionByRange(n_files, "doc_id") \
                .write.parquet(zpath)
            t0 = time.time()
            zm = collect_zonemap(spark, zpath, ["doc_id"]).cache()
            zm.count()
            t_build = time.time() - t0
            lo, hi = ids[0], ids[0] + max(1, n_docs // 50)  # ~2% range
            t0 = time.time()
            keep = prune_files(zm, "doc_id", lo, hi, path=zpath)
            t_probe = time.time() - t0
            pred = F.col("doc_id").between(lo, hi)
            t0 = time.time()
            full = spark.read.parquet(zpath).filter(pred).count()
            t_full = time.time() - t0
            t0 = time.time()
            pruned = read_pruned(spark, zpath, keep).filter(pred).count()
            t_pruned = time.time() - t0
            assert pruned == full
            print(json.dumps({
                "index": "zonemap", "files": n_files, "rows": n_docs,
                "build_s": round(t_build, 3),
                "probe_s": round(t_probe, 3),
                "kept_files": len(keep),
                "skip_ratio": round(1 - len(keep) / n_files, 3),
                "scan_full_s": round(t_full, 3),
                "scan_pruned_s": round(t_pruned, 3)}), flush=True)
            zm.unpersist()

            # -- bloom on a hash-sharded layout ----------------------
            bpath = os.path.join(tmp, f"hash_{n_files}")
            docs.repartition(n_files, "doc_id").write.parquet(bpath)
            t0 = time.time()
            bl = collect_bloom(spark, bpath, ["doc_id"]).cache()
            bl.count()
            t_build = time.time() - t0
            t0 = time.time()
            keep = prune_files_bloom(bl, "doc_id", ids, path=bpath)
            t_probe = time.time() - t0
            pred = F.col("doc_id").isin(ids)
            t0 = time.time()
            full = spark.read.parquet(bpath).filter(pred).count()
            t_full = time.time() - t0
            t0 = time.time()
            pruned = read_pruned(spark, bpath, keep).filter(pred).count()
            t_pruned = time.time() - t0
            assert pruned == full == len(ids)
            print(json.dumps({
                "index": "bloom", "files": n_files, "rows": n_docs,
                "build_s": round(t_build, 3),
                "probe_s": round(t_probe, 3),
                "kept_files": len(keep),
                "skip_ratio": round(1 - len(keep) / n_files, 3),
                "scan_full_s": round(t_full, 3),
                "scan_pruned_s": round(t_pruned, 3)}), flush=True)
            bl.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
