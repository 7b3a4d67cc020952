#!/usr/bin/env python
"""Stage-level task metrics for one suite query (guide §7.1 via REST).

Usage: python tools/profile_stages.py NAME [--passes N]

Runs NAME warm through the noop sink, then prints, for each stage of
the run's jobs: task count, total task time, max/median task time, and
shuffle read/write bytes — enough to tell compute-bound from
parallelism-trapped (one fat task) from shuffle-bound.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apsviz_timeseriesdb_ingest_spark import suite  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profstage", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**suite.all_queries(), **suite.displaced_queries()}
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    qs[args.name](spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long").count()

    def get(path: str):
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    for p in range(args.passes):
        seen = {s["stageId"] for s in get("stages")}
        t0 = time.perf_counter()
        qs[args.name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [s for s in get("stages?status=complete")
                  if s["stageId"] not in seen]
        stages.sort(key=lambda s: s["stageId"])
        print(f"== {args.name} pass{p} wall={wall:.3f}s "
              f"stages={len(stages)}")
        for s in stages:
            print(f"   stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                  f"taskTime={s['executorRunTime']/1e3:7.2f}s "
                  f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                  f"shufR={s['shuffleReadBytes']/2**20:6.1f}M "
                  f"shufW={s['shuffleWriteBytes']/2**20:6.1f}M "
                  f"in={s['inputBytes']/2**20:6.1f}M  {s['name'][:60]}")


if __name__ == "__main__":
    main()
