"""DSIR selection soak (r9 verdict weak #1 'done' criterion): run the
threshold-form ``dsir_select`` at n = corpus/2 over a synthetic
multi-million-row weights frame — the regime DSIR's published use case
implies (select a TARGET-SIZED subset) — and show:

- the driver holds NOTHING n-sized: RSS delta stays flat (the r9 path
  funneled the top-n through a single-task ordered limit and collected
  an n-row broadcast, both of which scale with n),
- the executed plan contains no TakeOrderedAndProject / no
  BroadcastExchange of the winner set even with auto-broadcast
  disabled (i.e. there is no explicit broadcast hint to fall back to),
- selected count == n exactly (the threshold + boundary-band
  enumeration is exact, not approximate),
- wall seconds per leg.

Weights are a deterministic hash expression (`spark.range` + md5), so
nothing corpus-sized ever exists driver-side. One JSON line per leg.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.functions.portable_hash import (  # noqa: E402
    md5_hash64,
)
from apsviz_timeseriesdb_ingest_spark.llm.lm import dsir_select  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    spark = get_spark("soak_dsir_select")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    for corpus_n in (200_000, 2_000_000):
        n = corpus_n // 2
        base = spark.range(corpus_n).select(F.col("id").alias("doc_id"))
        df = base.withColumn("text", F.lit("t"))
        # deterministic pseudo-random logweight in ~[-5, 5]
        w = base.select(
            "doc_id", F.lit(1).alias("n_grams"),
            ((md5_hash64(F.col("doc_id").cast("string"), seed="lw")
              % 10_000_000).cast("double") / 1_000_000.0 - 5.0)
            .alias("logweight"))
        r0 = rss_mb()
        t0 = time.perf_counter()
        sel = dsir_select(df, w, n)
        plan = sel._jdf.queryExecution().executedPlan().toString()
        got = sel.count()
        wall = round(time.perf_counter() - t0, 2)
        r1 = rss_mb()
        print(json.dumps({
            "leg": "dsir_select_half_corpus", "corpus_rows": corpus_n,
            "n": n, "selected": got, "exact": got == n,
            "wall_s": wall, "rss_mb_before": r0, "rss_mb_after": r1,
            "rss_mb_delta": round(r1 - r0, 1),
            "no_single_task_topn": "TakeOrderedAndProject" not in plan,
            "no_winner_broadcast": "BroadcastExchange" not in plan,
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
