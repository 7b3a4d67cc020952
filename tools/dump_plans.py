#!/usr/bin/env python
"""Regenerate docs/PLANS.md: formatted physical plans of the headline
queries at sf0.1, with the scale-relevant properties called out."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apsviz_timeseriesdb_ingest_spark import suite
from apsviz_timeseriesdb_ingest_spark.session import get_spark

SHOW = ["p1_equality_filter", "q1_pricing_summary", "q5_local_supplier_volume",
        "j7_keep_latest_dedup", "x1_event_pivot", "llm_minhash_lsh_pairs",
        "a8_salted_agg",
        # r4 gate-rotation flagships
        "j10_asof_join", "p5_overlap_join", "llm_kmeans_assign",
        "llm_perplexity_ngram"]


def main() -> None:
    spark = get_spark("plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**suite.all_queries(), **suite.displaced_queries()}
    out = ["# PLANS — physical plans of headline queries (sf0.1)",
           "", "Regenerate with `python tools/dump_plans.py`.", ""]
    for name in SHOW:
        df = qs[name](spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        props = {
            "broadcast joins": plan.count("BroadcastHashJoin"),
            "sort-merge joins": plan.count("SortMergeJoin"),
            "exchanges": plan.count("Exchange"),
            "pushed-filter scans": plan.count("PushedFilters: ["),
        }
        out += [f"## {name}", "",
                "Properties: " + ", ".join(f"{k}={v}" for k, v in props.items()),
                "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "docs", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
