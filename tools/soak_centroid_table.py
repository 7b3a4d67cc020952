"""CentroidTable scale curve over k — the assignment ladder's LAST rung
(r7 verdict task 1 done-criterion).

tools/soak_centroid_k.py measured literal vs broadcast-CentroidIndex to
k=10,000; this soak continues the curve to k=100,000 (dim 64 →
k·dim = 6.4M, past TABLE_FROM_KDIM = 4M) where the one-row broadcast
map frame degrades: its driver-side serialization and per-executor
deserialized footprint grow linearly in k while the shuffled
:class:`CentroidTable` ships the same centroids as a regular join side.

Per (k, path) leg: plan-build + execution wall seconds and
microseconds/row over a 20k x 64d replicated corpus (same corpus as
soak_centroid_k). The table leg additionally ASSERTS the rung's plan
contract: the fine stage is a ShuffledHashJoin and nothing k-sized is
broadcast (zero BroadcastHashJoin; a BroadcastNestedLoopJoin carrying
the sqrt(k)-sized COARSE index frame is allowed — that frame is
sqrt(k)·dim and stays tiny at every k here).

Expected shape: table exec µs/row ~flat in k (per-row candidate width
is nprobe·k/coarse_k ≈ nprobe·sqrt(k/nprobe), same as the index);
indexed plan+exec degrade with the k x dim frame until the broadcast
is the bottleneck. One JSON line per measurement on stdout.
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
    CentroidTable,
    kmeans_assign,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402

EMB = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 10
KS = [10_000, 40_000, 100_000]
INDEX_MAX_K = 40_000  # past this the broadcast frame is the documented
#                       failure regime; only the table leg runs
DIM = 64


def main() -> None:
    spark = get_spark("soak-centroid-table")
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
        legs = []
        t0 = time.perf_counter()
        tbl = CentroidTable(cents, iters=4)
        tbl_build = time.perf_counter() - t0
        legs.append(("table", tbl, tbl_build))
        if k <= INDEX_MAX_K:
            t0 = time.perf_counter()
            idx = CentroidIndex(cents, iters=4)
            legs.append(("indexed", idx, time.perf_counter() - t0))
        for path, obj, build_s in legs:
            t0 = time.perf_counter()
            df = kmeans_assign(corpus, cents, index=obj)
            plan_s = time.perf_counter() - t0
            if path == "table":
                # the rung's contract: the fine __ccell join is an
                # exchange, never a broadcast of the k-sized table.
                # (Other joins in the plan — e.g. the id join-back —
                # are Catalyst's size-based business: at this corpus
                # size it rightly broadcasts the 20k-row probe side.)
                plan = df._jdf.queryExecution().executedPlan().toString()
                fine = [ln for ln in plan.splitlines()
                        if "Join" in ln and "__ccell" in ln]
                assert fine and all("ShuffledHashJoin" in ln
                                    for ln in fine), fine
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            exec_s = time.perf_counter() - t0
            print(json.dumps({
                "k": k, "path": path, "n": n,
                "cluster_build_sec": round(build_s, 3),
                "plan_sec": round(plan_s, 3),
                "exec_sec": round(exec_s, 3),
                "us_per_row": round(1e6 * exec_s / n, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
