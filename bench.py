#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apsviz_timeseriesdb_ingest_spark import suite  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "j3_three_way_join_agg",
    "j7_keep_latest_dedup",
    "x1_event_pivot",
    "a2_count_distinct",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = suite.all_queries()
    names = [n for n in HEADLINE if n in queries]
    names += [n for n in sorted(queries) if n.startswith("llm_") and n not in names]

    # warm the JVM + parquet footers + the Python worker pool once so
    # timings measure the query, not process startup (the Arrow-batched
    # paths pay ~1s of daemon spawn on the session's first Python stage)
    queries[names[0]](spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
