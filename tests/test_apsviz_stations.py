"""ApsViz station publish: retain snapshots, overlap window, category
drops, location-type diff, anti-join, union, csvurl."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.plans.apsviz_stations import (
    ingest_retain_obs_station,
    publish_apsviz_stations,
)
from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

TM = dt.datetime(2024, 1, 10, 12, 0, 0)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("apsvizenv")
    _write(root / "stations.csv", [
        "TID_1,34.1,-77.1,gmt,NOAA/NOS,Alpha,tidal,us,nc,NH,01A",
        "TID_2,34.2,-77.2,gmt,NOAA/NOS,Beta,tidal,us,nc,BR,01B",
        "OCE_1,34.3,-77.3,gmt,NDBC,Gamma,ocean,us,nc,CA,01C",
        "COA_1,34.4,-77.4,gmt,NCEM,Delta,coastal,us,nc,ON,01D",
    ])
    _write(root / "meta.csv", [
        "data_source,source_name,source_archive,source_variable,filename_prefix,location_type,units",
        "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,tidal,m",
    ])
    catalog = Catalog(spark, str(root / "warehouse"))
    bootstrap(spark, catalog, station_csvs=[str(root / "stations.csv")],
              source_meta_csv=str(root / "meta.csv"))

    # retain snapshots: two overlap the query window, one is stale, one
    # is an excluded category
    common = dict(timemark=TM, begin_date=TM - dt.timedelta(days=1),
                  end_date=TM, source_name="noaa", source_archive="noaa")
    ingest_retain_obs_station(catalog, station_names=["TID_1", "TID_2"],
                              data_source="tidal_gauge", location_type="tidal",
                              **common)
    ingest_retain_obs_station(catalog, station_names=["OCE_1"],
                              data_source="ocean_buoy", location_type="ocean",
                              **common)
    ingest_retain_obs_station(catalog, station_names=["TID_2"],
                              data_source="tidal_predictions", location_type="tidal",
                              **common)
    ingest_retain_obs_station(
        catalog, station_names=["COA_1"], data_source="coastal_gauge",
        location_type="coastal", timemark=TM,
        begin_date=TM - dt.timedelta(days=30), end_date=TM - dt.timedelta(days=20),
        source_name="ncem", source_archive="contrails")  # stale: no overlap
    return {"catalog": catalog}


def test_retain_snapshot(env):
    retain = env["catalog"].read("retain_obs_station")
    assert retain.count() == 5
    assert retain.filter(F.col("data_source") == "tidal_predictions").count() == 1


def test_publish(env, spark):
    out = publish_apsviz_stations(
        spark, env["catalog"], model_run_id="4420-abc",
        adcirc_station_names=["TID_1"], data_source="NAMFORECAST_EC95D",
        source_name="adcirc", source_archive="renci", source_instance="inst1",
        forcing_metclass="synoptic", location_type="tidal", grid_name="EC95D",
        timemark=TM, all_location_types=["tidal"])
    rows = {r.station_name: r for r in out.collect()}
    # ADCIRC station present with model data_source
    assert rows["TID_1"].data_source == "NAMFORECAST_EC95D"
    # obs station not covered by ADCIRC joins in with its obs source
    assert rows["TID_2"].data_source == "tidal_gauge"  # excluded tidal_predictions deduped away
    # ocean type pulled in via the location-type diff (tidal run)
    assert rows["OCE_1"].data_source == "ocean_buoy"
    # stale coastal snapshot outside the 36h overlap window is absent
    assert "COA_1" not in rows
    # csvurl layout (F9)
    assert rows["TID_1"].csvurl == (
        "https://apsviz/ui-data/get_station_data?station_name=TID_1"
        "&time_mark=2024-01-10T12:00:00Z&data_source=NAMFORECAST_EC95D"
        "&instance_name=inst1&forcing_metclass=synoptic")
    assert len(rows) == 3


def test_publish_non_tidal_no_diff(env, spark):
    out = publish_apsviz_stations(
        spark, env["catalog"], model_run_id="4420-abc2",
        adcirc_station_names=["OCE_1"], data_source="NAMFORECAST_EC95D",
        source_name="adcirc", source_archive="renci", source_instance="inst1",
        forcing_metclass="synoptic", location_type="ocean", grid_name="EC95D",
        timemark=TM, all_location_types=["ocean"])
    # only the ADCIRC station: obs side restricted to ocean, whose one
    # station is covered by ADCIRC (anti-join removes it)
    assert [r.station_name for r in out.collect()] == ["OCE_1"]
