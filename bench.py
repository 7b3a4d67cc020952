#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline "value"/"queries" run each query once in a shared session
— each line therefore includes that query's one-time janino compile
(unchanged methodology across rounds, comparable to earlier BENCH_r*).
"warm_total"/"queries_warm" re-run the same plans already compiled:
steady-state execution cost, the number that scales with data volume
(compile is a constant; at 100 TB it vanishes, locally it dominates
several lines — see NOTES_r3).
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

    def run_all() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    timings = run_all()
    warm = run_all()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "headline_suite_total",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "value": round(sum(timings.values()), 3),
    }
    # the driver keeps only a ~2000-char tail of stdout, and the full
    # two-map record outgrew it (r7 verdict task 6: BENCH_r07's json was
    # head-clipped → unparseable). Persist the COMPLETE record to
    # BENCH_LAST.json, and print a line that is itself a complete,
    # parseable record — cold per-query map + both totals (~1.1 KB at
    # 38 queries) — so BENCH_r{N}.json stands alone.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST.json"), "w") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass
    printed = {k: v for k, v in record.items() if k != "queries_warm"}
    print(json.dumps(printed))


if __name__ == "__main__":
    main()
