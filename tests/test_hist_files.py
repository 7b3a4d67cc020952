"""Historic file staging (S10): name parsing, run matching, canonical
staging, and end-to-end replay through ModelIngest."""

from __future__ import annotations

import pytest

from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.plans.hist_files import (
    match_runs,
    parse_hist_filename,
    stage_run_directories,
)
from apsviz_timeseriesdb_ingest_spark.plans.model_ingest import ModelIngest
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

FC = ("adcirc_gfs_renci_GFSFORECAST_EC95D_FORECAST_NOAASTATIONS_"
      "2024-01-01T06:00:00_2024-01-01T12:00:00_2024-01-03T12:00:00.csv")
NC = ("adcirc_gfs_renci_NOWCAST_EC95D_NOWCAST_NOAASTATIONS_"
      "2024-01-01T06:00:00_2024-01-01T11:00:00_2024-01-01T12:00:00.csv")

PROPS = {
    "suite.model": "adcirc", "ADCIRCgrid": "ec95d", "advisory": "2024010106",
    "forcing.ensemblename": "gfsforecast", "forcing.metclass": "synoptic",
    "instancename": "inst1", "storm": "none", "stormname": "none",
    "stormnumber": "none", "physical_location": "renci",
    "time.currentdate": "240101", "time.currentcycle": "12",
    "workflow_type": "ecflow",
}


def test_parse_hist_filename():
    hf = parse_hist_filename(FC)
    assert hf.suite_model == "adcirc"
    assert hf.storm == "gfs"
    assert hf.physical_location == "renci"
    assert hf.forcing_ensemblename == "gfsforecast"
    assert hf.grid == "EC95D"
    assert hf.advisory == "2024010106"
    assert hf.uid == "2024010106-gfsforecast"
    assert hf.station_type == "NOAASTATIONS"
    nc = parse_hist_filename(NC)
    assert nc.forcing_ensemblename == "nowcast"
    assert nc.grid == "EC95D"


def test_coamps_parse():
    name = ("adcirc_coamps_al08_renci_OFCL_EC95D_FORECAST_NOAASTATIONS_"
            "2024-01-01T06:00:00_2024-01-01T12:00:00_2024-01-03T12:00:00.csv")
    hf = parse_hist_filename(name)
    assert hf.storm == "coamps_al08"
    assert hf.physical_location == "renci"
    assert hf.forcing_ensemblename == "ofcl"


def test_match_stage_replay(spark, tmp_path):
    # historic archive dir with forecast+nowcast pairs and meta twins
    hist = tmp_path / "hist"
    hist.mkdir()
    (hist / FC).write_text("STATION,TIME,WATER_LEVEL\nST_A,2024-01-01 12:00:00,0.5\n")
    (hist / ("adcirc_meta_" + FC[len("adcirc_"):])).write_text("STATION\nST_A\n")
    (hist / NC).write_text("STATION,TIME,WATER_LEVEL\nST_A,2024-01-01 11:00:00,0.4\n")
    (hist / ("adcirc_meta_" + NC[len("adcirc_"):])).write_text("STATION\nST_A\n")

    config = spark.createDataFrame(
        [(77, "2024010106-gfsforecast", k, v) for k, v in PROPS.items()],
        "instance_id long, uid string, key string, value string")

    matched = match_runs(config, str(hist), "adcirc_gfs_*FORECAST_NOAASTATIONS*.csv")
    assert [m["run_id"] for m in matched] == ["77-2024010106-gfsforecast"]
    staged = stage_run_directories(matched)
    assert len(staged) == 1
    run_dir = staged[0]
    import os
    assert sorted(os.listdir(run_dir)) == [
        "FORECAST_NOAASTATIONS.csv", "NOWCAST_NOAASTATIONS.csv",
        "meta_FORECAST_NOAASTATIONS.csv", "meta_NOWCAST_NOAASTATIONS.csv"]

    # replay through the standard model ingest
    (tmp_path / "stations.csv").write_text(
        "ST_A,34.1,-77.1,gmt,NOAA/NOS,Alpha,tidal,us,nc,NH,01A\n")
    (tmp_path / "meta.csv").write_text(
        "data_source,source_name,source_archive,source_variable,filename_prefix,location_type,units\n"
        "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,tidal,m\n")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    bootstrap(spark, catalog, station_csvs=[str(tmp_path / "stations.csv")],
              source_meta_csv=str(tmp_path / "meta.csv"))
    out = ModelIngest(spark, catalog, str(hist)).ingest_run(
        "77-2024010106-gfsforecast", config)
    assert out["files"] == 2 and out["rows"] == 2 and out["station_files"] == 1
