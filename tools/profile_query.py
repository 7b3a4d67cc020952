#!/usr/bin/env python
"""Per-job wall-clock profile of one or more suite queries.

Usage: python tools/profile_query.py NAME [NAME ...] [--passes N]

Runs each query through the noop sink ``--passes`` times (first pass =
cold, rest warm) in ONE session, labelling jobs per pass, then reads the
live UI REST API for per-job durations/descriptions so the expensive
jobs inside a multi-job query (scalar collects, checkpoints, the main
noop write) are individually attributable. Prints one line per job plus
a per-pass total. Guide §1.1/§1.5 (measure first, label your jobs).
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**suite.all_queries(), **suite.displaced_queries()}
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # warm the JVM + python worker pool (bench.py idiom)
    qs[args.names[0]](spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long").count()

    def jobs() -> list[dict]:
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            return json.load(r)

    for name in args.names:
        for p in range(args.passes):
            seen = {j["jobId"] for j in jobs()}
            spark.sparkContext.setJobDescription(f"{name}#p{p}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            new = sorted((j for j in jobs() if j["jobId"] not in seen),
                         key=lambda j: j["jobId"])
            print(f"== {name} pass{p} wall={wall:.3f}s jobs={len(new)}")
            for j in new:
                dur = (time.mktime(time.strptime(
                    j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                    - time.mktime(time.strptime(
                        j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")))
                ms_sub = float(j["submissionTime"][19:23].lstrip(".")or 0)/1e3 \
                    if "." in j["submissionTime"][:23] else 0.0
                ms_cmp = float(j["completionTime"][19:23].lstrip(".") or 0)/1e3 \
                    if "." in j["completionTime"][:23] else 0.0
                dur = dur - ms_sub + ms_cmp
                desc = (j.get("description") or j["name"])[:90]
                print(f"   job {j['jobId']:>4} {dur:7.3f}s  "
                      f"stages={len(j['stageIds'])}  {desc}")


if __name__ == "__main__":
    main()
