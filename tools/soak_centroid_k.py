"""Centroid-assignment scale curve over k (r6 verdict task 1).

``semantic_k(n) = n/500`` grows the cluster count with the corpus, but
the literal-centroid argmin (`_centroid_argmin_expr`) builds an
O(k·dim) projection: plan construction, janino compilation, and task
shipping all grow with k, and past a few hundred centroids the plan is
no longer buildable in reasonable time. The two-level
``CentroidIndex`` path ships the centroids as broadcast DATA — plan
size constant, per-row cost O(nprobe · k/coarse_k · dim).

This soak assigns a replicated embedding corpus (sf0.1 x REPLICAS =
20k vectors x 64 dims) at k = 64 .. 10,000 and reports, per (k, path):
plan-build + execution wall seconds and microseconds/row. The literal
path is capped at LITERAL_MAX_K (the regime the docstring already
documents as its bound); above it only the indexed path runs — that
asymmetry IS the finding. One JSON line per measurement on stdout.

Expected shape: indexed µs/row ~flat in k (slow growth from nprobe
candidate width); literal µs/row and especially plan seconds grow with
k until the path is unusable.
"""

from __future__ import annotations

import json
import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.similarity import (  # noqa: E402
    CentroidIndex,
    kmeans_assign,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402

EMB = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 10
KS = [64, 256, 1024, 4096, 10_000]
LITERAL_MAX_K = 1024
DIM = 64


def main() -> None:
    spark = get_spark("soak-centroid-k")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(EMB).select("vec_id", "embedding")
    par = spark.sparkContext.defaultParallelism
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = (base.crossJoin(reps)
              .select((F.col("vec_id") + F.col("rep") * 1_000_000)
                      .alias("vec_id"), "embedding")
              .repartition(par, "vec_id")
              .localCheckpoint(eager=True))
    n = corpus.count()
    r = random.Random(11)

    for k in KS:
        cents = [[r.gauss(0, 1) for _ in range(DIM)] for _ in range(k)]
        legs = [("indexed", {"index": CentroidIndex(cents)})]
        if k <= LITERAL_MAX_K:
            legs.append(("literal", {}))
        for path, kw in legs:
            t0 = time.perf_counter()
            df = kmeans_assign(corpus, cents, **kw)
            plan_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            exec_s = time.perf_counter() - t0
            print(json.dumps({
                "k": k, "path": path, "n": n,
                "plan_sec": round(plan_s, 3),
                "exec_sec": round(exec_s, 3),
                "us_per_row": round(1e6 * exec_s / n, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
