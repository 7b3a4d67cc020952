#!/usr/bin/env python
"""Measure the BASELINE.md engine-side metrics: obs ingest throughput,
overlapping re-ingest (dedup merge) latency, X1 pivot latency.

Generates synthetic harvest CSVs (~600k rows, comparable to sf0.1
lineitem) and runs the real pipeline end-to-end in a temp warehouse.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.plans.obs_ingest import ObsIngest
from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
    get_obs_timeseries_station_data,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

N_STATIONS = 200
N_FILES = 10
HOURS_PER_FILE = 300  # rows per station per file


def main() -> None:
    spark = get_spark("bench-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_ingest_")
    harvest = os.path.join(root, "harvest")
    os.makedirs(harvest)

    stations = [f"ST_{i:04d}" for i in range(N_STATIONS)]
    with open(f"{root}/stations.csv", "w") as f:
        for i, s in enumerate(stations):
            f.write(f"{s},34.{i%100},-77.{i%100},gmt,NOAA/NOS,Loc{i},tidal,us,nc,C{i%10},0A\n")
    with open(f"{root}/meta.csv", "w") as f:
        f.write("data_source,source_name,source_archive,source_variable,"
                "filename_prefix,location_type,units\n"
                "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,tidal,m\n")

    t0 = dt.datetime(2024, 1, 1)
    total_rows = 0
    for fidx in range(N_FILES):
        start = t0 + dt.timedelta(hours=fidx * HOURS_PER_FILE)
        stamp = start.strftime("%Y-%m-%dT%H_%M_%S")
        with open(f"{harvest}/noaa_stationdata_water_level_{stamp}.csv", "w") as f:
            f.write("STATION,TIME,WATER_LEVEL\n")
            for h in range(HOURS_PER_FILE):
                ts = (start + dt.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S")
                for s in stations:
                    f.write(f"{s},{ts},{(h % 40) / 10.0}\n")
                    total_rows += 1

    catalog = Catalog(spark, f"{root}/warehouse")
    bootstrap(spark, catalog, station_csvs=[f"{root}/stations.csv"],
              source_meta_csv=f"{root}/meta.csv")
    pipe = ObsIngest(spark, catalog, harvest)

    t = time.perf_counter()
    pipe.run_sequence_ingest()
    ingest_s = time.perf_counter() - t

    # overlapping re-harvest of the last window: dedup merge latency
    start = t0 + dt.timedelta(hours=(N_FILES - 1) * HOURS_PER_FILE + 100)
    stamp = start.strftime("%Y-%m-%dT%H_%M_%S")
    overlap_rows = 0
    with open(f"{harvest}/noaa_stationdata_water_level_{stamp}.csv", "w") as f:
        f.write("STATION,TIME,WATER_LEVEL\n")
        for h in range(HOURS_PER_FILE):
            ts = (start + dt.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S")
            for s in stations:
                f.write(f"{s},{ts},9.9\n")
                overlap_rows += 1
    t = time.perf_counter()
    pipe.run_sequence_ingest()
    merge_s = time.perf_counter() - t

    t = time.perf_counter()
    get_obs_timeseries_station_data(
        catalog, stations[0],
        t0.strftime("%Y-%m-%d %H:%M:%S"),
        (t0 + dt.timedelta(days=30)).strftime("%Y-%m-%d %H:%M:%S")).collect()
    pivot_s = time.perf_counter() - t

    n_final = catalog.read("gauge_data").count()
    print(json.dumps({
        "ingest_rows": total_rows, "ingest_sec": round(ingest_s, 2),
        "ingest_rows_per_sec": round(total_rows / ingest_s),
        "overlap_rows": overlap_rows, "merge_sec": round(merge_s, 2),
        "pivot_x1_sec": round(pivot_s, 2), "final_fact_rows": n_final,
    }))


if __name__ == "__main__":
    main()
