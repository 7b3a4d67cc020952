"""Sketch-row scale soak: wall time of one combined
``corpus_stats_row`` pass (HLL + KLL + Misra-Gries) at sf0.1 documents
and at 10x, plus merge cost over a 10-row window. The design claim
being measured: per-increment sketching is ONE corpus pass that scales
linearly, and merging a window of rows costs milliseconds-to-seconds
regardless of the corpus the rows summarize.

10x construction mirrors soak_neardup: per-replica letter permutation
via ``translate`` keeps token structure while growing the vocabulary
realistically (identical replication would make the HLL's job
trivially easy).

Usage: python tools/soak_sketches.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_CONS = "bcdfghjklmnpqrstvwxz"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.sketches import (
        corpus_stats_row, merge_corpus_sketches, merge_heavy_hitters,
        merge_length_sketches, sketch_estimates)
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.ui.enabled", "false")
             .appName("soak_sketches").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = (load_table(spark, args.sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(int(args.cpus)).cache())
    n = base.count()

    def replicate(times: int):
        parts = []
        for i in range(times):
            rot = _CONS[i:] + _CONS[:i]
            parts.append(base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.lower("text"), _CONS, rot).alias("text")))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.repartition(int(args.cpus)).cache()

    for times in (1, 10):
        df = replicate(times)
        rows = df.count()
        t0 = time.time()
        row = corpus_stats_row(df)
        row.collect()
        t_sketch = time.time() - t0
        # a 10-row window merge (per-batch rows from 10 increments)
        parts = corpus_stats_row(df.filter(F.col("doc_id") % 10 == 0))
        for i in range(1, 10):
            parts = parts.unionByName(
                corpus_stats_row(df.filter(F.col("doc_id") % 10 == i)))
        window = parts.cache()
        window.count()  # materialize the 10 increment rows first
        t0 = time.time()
        est = sketch_estimates(merge_corpus_sketches(window)).collect()[0]
        merge_length_sketches(window).collect()
        merge_heavy_hitters(window).collect()
        t_merge = time.time() - t0
        print(json.dumps({
            "scale": f"{times}x", "docs": rows,
            "sketch_pass_s": round(t_sketch, 3),
            "docs_per_s": int(rows / t_sketch),
            "merge_10rows_s": round(t_merge, 3),
            "vocab_estimate": est.vocab_estimate,
            "n_docs_merged": est.n_docs}), flush=True)
        assert est.n_docs == rows
        window.unpersist()
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
