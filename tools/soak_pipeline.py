"""Corpus-prep pipeline scale-curve datapoint (r3 verdict task 6):
run ``prepare_training_corpus`` (catalog-checkpointed) +
``export_training_shards`` end-to-end at sf0.1 and at "sf1" (the sf0.1
documents replicated 10x with DISTINCT ids and fresh multi-file
parquet input), and report rows/s at both scales. One JSON line per
scale on stdout."""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (  # noqa: E402
    export_training_shards,
    prepare_training_corpus,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog  # noqa: E402


def run_scale(spark, docs_path: str, work: str, label: str) -> dict:
    docs = spark.read.parquet(docs_path)
    n_in = docs.count()
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    cat = Catalog(spark, f"{work}/wh_{label}")
    t0 = time.time()
    corpus, audit = prepare_training_corpus(
        train, bench, catalog=cat, max_bucket_size=200)
    receipt = export_training_shards(
        corpus, f"{work}/shards_{label}", docs_per_shard=20_000)
    row = receipt.collect()[0]
    dt = time.time() - t0
    out = {"scale": label, "rows_in": n_in, "rows_kept": int(row.n_docs),
           "shards": int(row.n_shards), "wall_sec": round(dt, 1),
           "rows_per_sec": int(n_in / dt)}
    drops = {r["drop_reason"]: r["count"] for r in
             audit.groupBy("drop_reason").count().collect()}
    out["drop_reasons"] = {str(k): int(v) for k, v in drops.items()}
    return out


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pipe_soak_")
    try:
        print(json.dumps(run_scale(
            spark, "/root/testdata/sf0.1/documents.parquet", work,
            "sf0.1")), flush=True)

        # sf1 = 10x replication with distinct ids, written as a real
        # multi-file parquet input (the single-file trap is the corpus
        # read path's known hazard — a fresh write avoids conflating it)
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        big = (base.crossJoin(reps)
               .withColumn("doc_id", F.col("doc_id")
                           + F.col("rep") * F.lit(10_000_000))
               .drop("rep"))
        big.repartition(32).write.mode("overwrite") \
            .parquet(f"{work}/sf1_documents")
        print(json.dumps(run_scale(
            spark, f"{work}/sf1_documents", work, "sf1")), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
