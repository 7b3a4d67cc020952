#!/usr/bin/env python
"""Dump .explain('formatted') output for named suite queries to files.

Usage: python tools/dump_plan_files.py OUTDIR SUFFIX NAME [NAME ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query — the judge-facing
plan evidence for optimization rounds (plans/r11/*_before.txt etc).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apsviz_timeseriesdb_ingest_spark import suite  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**suite.all_queries(), **suite.displaced_queries()}
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
