"""train_kmeans_table end-to-end soak at k = 1M (r9 verdict task 5 —
the r9 soak trained at k=2k/10k and only from_frame was soaked at 1M)
plus the coarse-reuse A/B (r9 verdict task 3 'done' criterion).

Per-ITERATION visibility comes from wrapping ``CentroidTable.from_frame``
with a recorder: each Lloyd's iteration calls it exactly once, so the
recorder captures a per-iteration (wall, driver-RSS) series without
touching the training loop. Asserted shape:

- driver RSS stays FLAT across iterations at k=1M (nothing k-sized on
  the driver, per-iteration state is a table),
- with ``coarse_reuse=True`` (the r10 default) iterations after the
  first skip the ≤50k sample collect + numpy coarse retrain — the A/B
  at k=100k reports the per-iteration wall drop vs
  ``coarse_reuse=False``.

Synthetic corpus/centroids are ``spark.range`` expressions (never
driver-side). One JSON line per leg.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import apsviz_timeseriesdb_ingest_spark.llm.similarity as sim  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def synth_vec(col, dim: int):
    return F.array(*[(((col + 1) * (j * 2654435761 + 40503))
                      % 2000003 - 1000001).cast("double") / 1000001.0
                     for j in range(dim)])


class FromFrameRecorder:
    """Per-iteration (wall, rss) series: one from_frame call per
    Lloyd's iteration."""

    def __init__(self):
        self.real = sim.CentroidTable.from_frame.__func__
        self.series = []

    def install(self):
        rec = self

        def wrapped(cls, *a, **kw):
            t0 = time.perf_counter()
            out = rec.real(cls, *a, **kw)
            rec.series.append({"from_frame_s":
                               round(time.perf_counter() - t0, 2),
                               "rss_mb": rss_mb()})
            return out
        sim.CentroidTable.from_frame = classmethod(wrapped)

    def restore(self):
        sim.CentroidTable.from_frame = classmethod(self.real)


def train_leg(spark, *, corpus_n, k, dim, iters, coarse_k, nprobe,
              coarse_reuse, label):
    corpus = (spark.range(corpus_n)
              .select(F.col("id").alias("vec_id"),
                      synth_vec(F.col("id") * 13 + 1, dim)
                      .alias("embedding"))
              .localCheckpoint(eager=True))
    rec = FromFrameRecorder()
    rec.install()
    try:
        r0 = rss_mb()
        t0 = time.perf_counter()
        cent = sim.train_kmeans_table(corpus, k=k, iters=iters,
                                      n=corpus_n, dim=dim,
                                      coarse_k=coarse_k, nprobe=nprobe,
                                      coarse_reuse=coarse_reuse)
        n_out = cent.count()
        wall = round(time.perf_counter() - t0, 2)
        r1 = rss_mb()
    finally:
        rec.restore()
    rss_series = [s["rss_mb"] for s in rec.series]
    print(json.dumps({
        "leg": label, "k": k, "dim": dim, "corpus_rows": corpus_n,
        "iters": iters, "coarse_reuse": coarse_reuse,
        "centroids_out": n_out, "wall_s": wall,
        "per_iteration": rec.series,
        "rss_mb_before": r0, "rss_mb_after": r1,
        "rss_flat_across_iterations":
            (max(rss_series) - min(rss_series) < 200) if rss_series
            else None,
    }), flush=True)
    return wall


def main() -> None:
    spark = get_spark("soak_kmeans_1m")
    spark.sparkContext.setLogLevel("ERROR")

    # A/B at k=100k: per-iteration wall drop from coarse reuse
    for reuse in (True, False):
        train_leg(spark, corpus_n=500_000, k=100_000, dim=8, iters=3,
                  coarse_k=2048, nprobe=1, coarse_reuse=reuse,
                  label="kmeans_100k_ab")

    # the 1M end-to-end training leg
    train_leg(spark, corpus_n=1_200_000, k=1_000_000, dim=8, iters=2,
              coarse_k=8192, nprobe=1, coarse_reuse=True,
              label="kmeans_1m")

    spark.stop()


if __name__ == "__main__":
    main()
