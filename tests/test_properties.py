"""Property tests (SURVEY section 5.4): ingest is permutation-invariant —
the same files ingested in any order produce identical fact tables,
because dedup ordering is (timemark, file datetime, file key), not load
order. Also the X2 allparms pivot golden."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.plans.obs_ingest import ObsIngest
from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
    get_obs_timeseries_station_data_allparms,
    to_json_array,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

META = [
    "data_source,source_name,source_archive,source_variable,filename_prefix,location_type,units",
    "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,tidal,m",
    "wind_anemometer,noaa,noaa,wind_speed,noaa_stationdata_wind_speed,tidal,mps",
]

FILES = {
    # three files with pairwise overlaps, deliberately conflicting values
    "noaa_stationdata_water_level_2024-01-01T00:00:00.csv": [
        "STATION,TIME,WATER_LEVEL",
        "ST_A,2024-01-01 00:00:00,1.0", "ST_A,2024-01-01 01:00:00,1.1"],
    "noaa_stationdata_water_level_2024-01-01T02:00:00.csv": [
        "STATION,TIME,WATER_LEVEL",
        "ST_A,2024-01-01 01:00:00,2.1", "ST_A,2024-01-01 02:00:00,2.2"],
    "noaa_stationdata_water_level_2024-01-01T04:00:00.csv": [
        "STATION,TIME,WATER_LEVEL",
        "ST_A,2024-01-01 02:00:00,3.2", "ST_A,2024-01-01 03:00:00,3.3"],
    "noaa_stationdata_wind_speed_2024-01-01T02:00:00.csv": [
        "STATION,TIME,WIND_SPEED",
        "ST_A,2024-01-01 00:00:00,7.5", "ST_A,2024-01-01 01:00:00,8.5"],
}


def _setup(spark, root, file_order):
    _w = lambda p, lines: open(p, "w").write("\n".join(lines) + "\n")
    (root / "harvest").mkdir()
    _w(root / "stations.csv", ["ST_A,34.1,-77.1,gmt,NOAA/NOS,Alpha,tidal,us,nc,NH,01A"])
    _w(root / "meta.csv", META)
    catalog = Catalog(spark, str(root / "warehouse"))
    bootstrap(spark, catalog, station_csvs=[str(root / "stations.csv")],
              source_meta_csv=str(root / "meta.csv"))
    pipe = ObsIngest(spark, catalog, str(root / "harvest"))
    for name in file_order:
        _w(root / "harvest" / name, FILES[name])
        pipe.run_sequence_ingest()  # one file at a time, in the given order
    return catalog


def _facts(catalog):
    return sorted(
        (str(r.timemark), str(r.time), repr(r.water_level), repr(r.wind_speed))
        for r in catalog.read("gauge_data").collect())


def test_permutation_invariance(spark, tmp_path_factory):
    orders = [list(FILES), list(reversed(list(FILES)))]
    results = []
    for i, order in enumerate(orders):
        root = tmp_path_factory.mktemp(f"perm{i}")
        results.append(_facts(_setup(spark, root, order)))
    assert results[0] == results[1]
    # keep-latest semantics independent of arrival order
    wl = {t: v for _, t, v, _ in results[0] if v != "None"}
    assert wl["2024-01-01 01:00:00"] == "2.1"
    assert wl["2024-01-01 02:00:00"] == "3.2"


def test_x2_allparms_golden(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("x2env")
    catalog = _setup(spark, root, list(FILES))
    df = get_obs_timeseries_station_data_allparms(
        catalog, "ST_A", "2024-01-01 00:00:00", "2024-01-01 04:00:00",
        nowcast_source="NOWCAST_NCSC_SAB_v1.23")
    assert df.columns == [
        "time_stamp", "air_barometer", "NOWCAST_NCSC_SAB_v123",
        "ocean_buoy_wave_height", "tidal_gauge_water_level", "tidal_predictions",
        "coastal_gauge_water_level", "river_gauge_water_level",
        "stream_gauge_stream_elevation", "wind_anemometer"]
    payload = json.loads(to_json_array(df))
    by_time = {r["time_stamp"]: r for r in payload}
    # water_level rides the tidal_gauge column, wind the anemometer column
    assert by_time["2024-01-01 00:00:00"]["tidal_gauge_water_level"] == 1.0
    assert by_time["2024-01-01 00:00:00"]["wind_anemometer"] == 7.5
    assert by_time["2024-01-01 03:00:00"]["tidal_gauge_water_level"] == 3.3
    assert by_time["2024-01-01 03:00:00"]["wind_anemometer"] is None
