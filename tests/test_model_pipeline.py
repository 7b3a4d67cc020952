"""Model-run ingest tests: X5 run-property pivot, F3/F6 derivations,
source auto-registration, rerun keep-latest dedup, X3/X4 read pivots."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
from apsviz_timeseriesdb_ingest_spark.plans.dashboard_meta import (
    get_adcirc_run_property_variables,
)
from apsviz_timeseriesdb_ingest_spark.plans.model_ingest import (
    ModelIngest,
    derive_source,
    derive_timemark,
)
from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
    get_forecast_timeseries_station_data,
    get_nowcast_timeseries_station_data,
    to_json_array,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

RUN_ID = "4420-21ab3d_gfs"

PROPS = {
    "suite.model": "adcirc", "ADCIRCgrid": "NCSC_SAB_v1.23", "advisory": "2024010112",
    "forcing.ensemblename": "namforecast", "forcing.metclass": "synoptic",
    "instancename": "ncsc123_gfs_sb55.01", "storm": "none", "stormname": "none",
    "stormnumber": "none", "physical_location": "renci",
    "time.currentdate": "240101", "time.currentcycle": "12",
    "workflow_type": "ecflow",
}


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("modelenv")
    _write(root / "stations.csv", [
        "ST_A,34.1,-77.1,gmt,NOAA/NOS,Alpha,tidal,us,nc,NH,0101A",
        "ST_B,34.2,-77.2,gmt,NOAA/NOS,Beta,tidal,us,nc,BR,0101B",
    ])
    _write(root / "meta.csv", [
        "data_source,source_name,source_archive,source_variable,filename_prefix,location_type,units",
        "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,tidal,m",
    ])
    catalog = Catalog(spark, str(root / "warehouse"))
    bootstrap(spark, catalog, station_csvs=[str(root / "stations.csv")],
              source_meta_csv=str(root / "meta.csv"))

    run_dir = root / "harvest" / RUN_ID
    run_dir.mkdir(parents=True)
    _write(run_dir / "FORECAST_NOAASTATIONS.csv", [
        "STATION,TIME,WATER_LEVEL",
        "ST_A,2024-01-01 12:00:00,0.5",
        "ST_A,2024-01-01 13:00:00,0.6",
        "ST_B,2024-01-01 12:00:00,0.7",
    ])
    _write(run_dir / "NOWCAST_NOAASTATIONS.csv", [
        "STATION,TIME,WATER_LEVEL",
        "ST_A,2024-01-01 10:00:00,0.3",
        "ST_A,2024-01-01 11:00:00,0.4",
    ])
    _write(run_dir / "meta_FORECAST_NOAASTATIONS.csv", [
        "STATION", "ST_A", "ST_B",
    ])

    items = [(4420, "21ab3d_gfs", k, v) for k, v in PROPS.items()]
    config_items = spark.createDataFrame(
        items, "instance_id long, uid string, key string, value string")
    return {"catalog": catalog, "harvest": str(root / "harvest"),
            "config": config_items}


def test_x5_property_pivot(env):
    props = get_adcirc_run_property_variables(env["config"], RUN_ID)
    assert props["ADCIRCgrid"] == "NCSC_SAB_v1.23"
    assert props["time.currentcycle"] == "12"
    with pytest.raises(KeyError):
        get_adcirc_run_property_variables(env["config"], "nope-run")


def test_f3_timemark():
    assert str(derive_timemark("240101", "12")) == "2024-01-01 12:00:00"


def test_f6_source_derivation():
    fc = derive_source(PROPS, "FORECAST", "NOAASTATIONS")
    assert fc["data_source"] == "NAMFORECAST_NCSC_SAB_V1.23"
    assert fc["filename_prefix"] == "adcirc_none_RENCI_NAMFORECAST_NCSC_SAB_V1.23_FORECAST_NOAASTATIONS"
    nc = derive_source(PROPS, "NOWCAST", "NOAASTATIONS")
    assert nc["data_source"] == "NOWCAST_NCSC_SAB_V1.23"
    tropical = dict(PROPS, **{"forcing.metclass": "tropical", "storm": "ian"})
    assert derive_source(tropical, "FORECAST", "NOAASTATIONS")["data_source"] == \
        "ian_NAMFORECAST_NCSC_SAB_V1.23"
    assert derive_source(tropical, "NOWCAST", "NDBCBUOYS")["data_source"] == \
        "ian_NOWCAST_NCSC_SAB_V1.23"
    assert derive_source(PROPS, "FORECAST", "NDBCBUOYS")["location_type"] == "ocean"


def test_ingest_run(env, spark):
    pipe = ModelIngest(spark, env["catalog"], env["harvest"])
    out = pipe.ingest_run(RUN_ID, env["config"])
    assert out == {"files": 2, "rows": 5, "station_files": 1}
    # sources auto-registered: forecast + nowcast
    meta = env["catalog"].read("source_model_meta")
    assert meta.count() == 2
    ms = env["catalog"].read("model_source")
    assert ms.count() == 4  # 2 sources x 2 tidal stations
    assert pipe.model_data().count() == 5
    # apsviz stations published for the run with the forecast data_source
    aps = env["catalog"].read("apsviz_station")
    rows = {r.station_name: r for r in aps.collect()}
    assert set(rows) == {"ST_A", "ST_B"}
    assert rows["ST_A"].data_source == "NAMFORECAST_NCSC_SAB_V1.23"
    assert rows["ST_A"].model_run_id == RUN_ID
    fm = env["catalog"].read("apsviz_station_file_meta")
    assert fm.count() == 1
    # per-run csvurl ledger row independently queryable
    # (run/runModelIngest.py:405: UI_DATA_URL recorded per meta file)
    assert fm.first().csvurl == "https://apsviz/ui-data"
    assert fm.first().model_run_id == RUN_ID


def test_rerun_dedup(env, spark):
    pipe = ModelIngest(spark, env["catalog"], env["harvest"])
    out = pipe.ingest_run(RUN_ID, env["config"])  # same run again
    assert out["files"] == 2
    assert out["station_files"] == 0  # meta ledger makes publish idempotent
    # rerun replaces, does not duplicate (key: source_id, timemark, time)
    assert pipe.model_data().count() == 5
    # ledger keeps both processing passes (audit parity)
    assert env["catalog"].read("harvest_model_file_meta").count() == 4


def test_station_ledger_probe_is_per_run(env, spark):
    """The publish ledger probe is scoped to THIS run (reference:
    run/runModelIngest.py:90-94 queries by run identifiers), so the
    driver-side seen-set stays O(run) when the ledger holds years of
    history — and a rerun is still idempotent with 10k foreign-run rows
    present (r6 verdict task 4)."""
    catalog = env["catalog"]
    before = catalog.read("apsviz_station_file_meta").count()
    foreign = spark.range(10_000).select(
        F.lit("/other").alias("dir_path"),
        F.concat(F.lit("meta_FORECAST_OTHER_"), F.col("id")).alias("file_name"),
        F.lit("2023-01-01 00:00:00").cast("timestamp_ntz").alias("timemark"),
        F.lit("x").alias("data_source"), F.lit("x").alias("source_name"),
        F.lit("x").alias("source_archive"), F.lit("x").alias("source_instance"),
        F.lit("x").alias("forcing_metclass"), F.lit("G").alias("grid_name"),
        F.concat(F.lit("run-"), F.col("id")).alias("model_run_id"),
        F.lit("2023-01-01 00:00:00").cast("timestamp_ntz").alias("data_date_time"),
        F.lit("tidal").alias("location_type"),
        F.lit("u").alias("csvurl"), F.lit(True).alias("ingested"))
    catalog.append(foreign, "apsviz_station_file_meta")

    pipe = ModelIngest(spark, catalog, env["harvest"])
    out = pipe.ingest_run(RUN_ID, env["config"])
    # idempotent against its OWN run's ledger row, untouched by history
    assert out["station_files"] == 0
    assert catalog.read("apsviz_station_file_meta").count() == before + 10_000
    # the probe frame itself is run-scoped: collecting it yields the
    # run's rows only, not the 10k-row history
    run_rows = (catalog.read("apsviz_station_file_meta")
                .filter(F.col("model_run_id") == RUN_ID)
                .select("file_name").collect())
    assert len(run_rows) == before

    # with a Bloom sidecar on model_run_id the probe also FILE-skips
    # (read_equals path) and behavior is unchanged
    from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
        build_skipping, read_equals)
    from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
        list_parquet_files)

    build_skipping(catalog, "apsviz_station_file_meta",
                   equality_cols=["model_run_id"])
    probe = read_equals(catalog, "apsviz_station_file_meta",
                        "model_run_id", [RUN_ID])
    assert {r.file_name for r in probe.select("file_name").collect()} == \
        {r.file_name for r in run_rows}
    assert len(probe.inputFiles()) < len(
        list_parquet_files(catalog.path("apsviz_station_file_meta")))
    out2 = pipe.ingest_run(RUN_ID, env["config"])
    assert out2["station_files"] == 0


def test_x3_forecast_pivot(env):
    df = get_forecast_timeseries_station_data(
        env["catalog"], "ST_A", "2024-01-01 12:00:00", "2024-01-02 00:00:00",
        "NAMFORECAST_NCSC_SAB_V1.23", "ncsc123_gfs_sb55.01")
    assert df.columns == ["time_stamp", "NAMFORECAST_NCSC_SAB_V123"]  # dots stripped
    payload = json.loads(to_json_array(df))
    assert [r["NAMFORECAST_NCSC_SAB_V123"] for r in payload] == [0.5, 0.6]


def test_x4_nowcast_pivot(env):
    df = get_nowcast_timeseries_station_data(
        env["catalog"], "ST_A", "2024-01-01 00:00:00", "2024-01-01 11:30:00",
        "NOWCAST_NCSC_SAB_V1.23", "ncsc123_gfs_sb55.01")
    payload = json.loads(to_json_array(df))
    assert [r["time_stamp"] for r in payload] == [
        "2024-01-01 10:00:00", "2024-01-01 11:00:00"]
    assert [r["NOWCAST_NCSC_SAB_V123"] for r in payload] == [0.3, 0.4]


def test_cleanup_run_dir(env, spark):
    # M5 model-path parity (runModelIngest.py:575-580): the per-run
    # staging dir is removed once every ledgered file is flipped; a rerun
    # after cleanup is a no-op. Runs LAST in this module - it deletes the
    # shared run dir.
    import os

    pipe = ModelIngest(spark, env["catalog"], env["harvest"])
    run_dir = os.path.join(env["harvest"], RUN_ID)
    assert os.path.isdir(run_dir)
    assert pipe.cleanup_run_dir(RUN_ID) is True
    assert not os.path.exists(run_dir)
    assert pipe.cleanup_run_dir(RUN_ID) is False  # idempotent
    # fact data untouched
    assert pipe.model_data().count() == 5
