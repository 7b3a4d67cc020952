"""BM25 retrieval scale soak: persisted-index build wall, index size,
and probe wall at sf0.1 documents and at 10x — the last heavy operator
family without a recorded scale curve (NOTES_r6 candidate 5).

What the curve should show if the design holds:

- build: one tokenize+count pass — ~linear in corpus tokens;
- probe: the term-hash-bucket partition filter makes a query batch
  touch ~|query vocab|/64 of the index, so probe wall should grow far
  slower than the corpus (index rows per touched bucket grow with the
  corpus's per-term posting lengths, not its file count);
- direct (index-free) scoring re-tokenizes the corpus per batch —
  measured alongside to show what the index buys.

10x construction: per-replica consonant permutation (soak_neardup's) —
token structure and document lengths unchanged, vocabulary and posting
tables grow realistically, and the SAME probe queries (built from
replica-0 text) have real matches at both scales.

Usage: python tools/soak_bm25.py [--sf-dir /root/testdata/sf0.1]
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

_CONS = "bcdfghjklmnpqrstvwxz"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.llm.retrieval import (
        bm25_topk, bm25_topk_from_index, build_bm25_index)
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.ui.enabled", "false")
             .appName("soak_bm25").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = (load_table(spark, args.sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(int(args.cpus)).cache())
    base.count()

    # queries: middle trigrams of the first N replica-0 docs
    queries = (base.orderBy("doc_id").limit(args.queries)
               .select(F.col("doc_id").alias("query_id"),
                       F.concat_ws(
                           " ", F.slice(F.split(F.lower("text"),
                                                r"\s+"), 4, 3))
                       .alias("text"))
               .cache())
    queries.count()

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

    with tempfile.TemporaryDirectory() as tmp:
        for times in (1, 10):
            docs = replicate(times)
            n = docs.count()
            cat = Catalog(spark, os.path.join(tmp, f"wh_{times}"))

            t0 = time.time()
            build_bm25_index(cat, docs, table="bm25")
            t_build = time.time() - t0
            tf_rows = cat.read("bm25_tf").count()

            t0 = time.time()
            probe = bm25_topk_from_index(cat, queries, table="bm25",
                                         top_k=10)
            n_hits = probe.count()
            t_probe = time.time() - t0

            t0 = time.time()
            direct = bm25_topk(docs, queries, top_k=10)
            n_direct = direct.count()
            t_direct = time.time() - t0

            print(json.dumps({
                "scale": f"{times}x", "docs": n, "tf_rows": tf_rows,
                "build_s": round(t_build, 2),
                "probe_s": round(t_probe, 2), "probe_rows": n_hits,
                "direct_s": round(t_direct, 2),
                "direct_rows": n_direct,
                "queries": args.queries}), flush=True)
            docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
