"""End-to-end with the reference's real seed data (read-only inputs per
FIXTURES.md section 5): 4 geom station CSVs (688 stations), the real
11-source config, one synthetic harvest file per source prefix."""

from __future__ import annotations

import datetime as dt
import os
from glob import glob

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.plans.obs_ingest import ObsIngest
from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
    get_obs_timeseries_station_data,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

REF = "/root/reference"
STATION_CSVS = sorted(glob(os.path.join(REF, "stations", "geom_*_meta.csv")))
SOURCE_META = os.path.join(REF, "run", "source_obs_meta.csv")

pytestmark = pytest.mark.skipif(not STATION_CSVS, reason="reference data absent")


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("refenv")
    (root / "harvest").mkdir()
    catalog = Catalog(spark, str(root / "warehouse"))
    bootstrap(spark, catalog, station_csvs=STATION_CSVS, source_meta_csv=SOURCE_META)
    return {"root": root, "harvest": str(root / "harvest"), "catalog": catalog}


def test_real_dims(env):
    stations = env["catalog"].read("gauge_station")
    assert stations.count() == 676  # 4 geom CSVs (676 rows; SURVEY's 688 over-counted)
    types = {r.location_type for r in stations.select("location_type").distinct().collect()}
    assert types == {"tidal", "coastal", "river", "ocean"}
    meta = env["catalog"].read("source_obs_meta")
    assert meta.count() == 11  # run/source_obs_meta.csv:1-12
    src = env["catalog"].read("gauge_source")
    # every (source config x matching-location-type station) pair
    per_type = {r.location_type: r.n for r in
                stations.groupBy("location_type").agg(F.count("*").alias("n")).collect()}
    expected = sum(per_type[r.location_type] for r in meta.collect())
    assert src.count() == expected
    assert src.select("source_id").distinct().count() == src.count()  # no hash collisions


def test_real_source_ingest_all_prefixes(env, spark):
    meta = env["catalog"].read("source_obs_meta").collect()
    stations = env["catalog"].read("gauge_station")
    t0 = dt.datetime(2024, 2, 1)
    for m in meta:
        pick = [r.station_name for r in
                stations.filter(F.col("location_type") == m.location_type)
                .orderBy("station_name").limit(2).collect()]
        lines = [f"STATION,TIME,{m.source_variable.upper()}"]
        for i, s in enumerate(pick):
            lines.append(f"{s},{(t0 + dt.timedelta(hours=i)):%Y-%m-%d %H:%M:%S},1.{i}")
        name = f"{m.filename_prefix}_2024-02-01T00:00:00.csv"
        with open(os.path.join(env["harvest"], name), "w") as f:
            f.write("\n".join(lines) + "\n")

    pipe = ObsIngest(spark, env["catalog"], env["harvest"])
    out = pipe.run_sequence_ingest()
    assert out["discovered"] == 11 and out["ingested"] == 11
    data = pipe.gauge_data()
    assert data.count() == 22  # 2 rows per source file
    # every measure column landed for at least one source
    present = {m for m in ("water_level", "wave_height", "wind_speed",
                           "air_pressure", "stream_elevation")
               if data.filter(F.col(m).isNotNull()).count() > 0}
    assert present == {"water_level", "wave_height", "wind_speed",
                       "air_pressure", "stream_elevation"}


def test_real_station_pivot(env):
    # first real tidal station that got data
    stations = env["catalog"].read("gauge_station")
    tidal = [r.station_name for r in
             stations.filter(F.col("location_type") == "tidal")
             .orderBy("station_name").limit(1).collect()]
    df = get_obs_timeseries_station_data(env["catalog"], tidal[0],
                                         "2024-02-01 00:00:00", "2024-02-02 00:00:00")
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns[0] == "time_stamp"
