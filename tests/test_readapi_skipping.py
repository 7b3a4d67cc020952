"""Zone-map file skipping wired into the dashboard read API (r6 verdict
task 7): the X1/X3/X4 pivots' fact scans prune their FILE list through
the ``{table}__zm`` sidecar before any task is scheduled. Contract:
results byte-identical with and without the sidecar (skipping is I/O
only), and the skipping read schedules strictly fewer input files on a
multi-month table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
    get_obs_timeseries_station_data,
    get_obs_timeseries_station_data_allparms,
)
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.sources.skipping import (
    build_skipping,
    zm_table,
)
from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
    list_parquet_files,
)


def _env(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    station = spark.createDataFrame(
        [(1, "ST_A", 34.1, -77.1, "gmt", "NOAA", "Alpha", "tidal",
          "us", "nc", "NH", "0101A")],
        "station_id long, station_name string, lat double, lon double, "
        "tz string, gauge_owner string, location_name string, "
        "location_type string, country string, state string, "
        "county string, geom string")
    source = spark.createDataFrame(
        [(10, 1, "tidal_gauge", "noaa", "noaa", "m")],
        "source_id long, station_id long, data_source string, "
        "source_name string, source_archive string, units string")
    catalog.overwrite(station, "gauge_station")
    catalog.overwrite(source, "gauge_source")
    # 6 months x 4 files per month of hourly-ish facts
    t0 = dt.datetime(2024, 1, 1)
    for chunk in range(4):
        rows = [(10, t0, t0 + dt.timedelta(days=d, hours=chunk),
                 0.1 * d + chunk, None, None, None, None, None)
                for d in range(0, 180, 3)]
        df = spark.createDataFrame(
            rows, "source_id long, timemark timestamp_ntz, "
            "time timestamp_ntz, water_level double, wave_height double, "
            "wind_speed double, air_pressure double, "
            "stream_elevation double, flow_volume double")
        catalog.append(
            df.withColumn("time_bucket", F.date_format("time", "yyyy-MM"))
            .coalesce(1),
            "gauge_data", partition_by=["time_bucket"])
    return catalog


def test_pivot_results_identical_and_fewer_files(spark, tmp_path):
    catalog = _env(spark, tmp_path)
    args = (catalog, "ST_A", "2024-02-03 00:00:00", "2024-02-20 00:00:00")

    plain = get_obs_timeseries_station_data(*args)
    plain_rows = sorted(map(tuple, plain.collect()))
    plain_files = len(plain.inputFiles())

    build_skipping(catalog, "gauge_data", range_cols=["time"])
    pruned = get_obs_timeseries_station_data(*args)
    assert sorted(map(tuple, pruned.collect())) == plain_rows
    pruned_files = len(pruned.inputFiles())
    total = len(list_parquet_files(catalog.path("gauge_data")))
    # partition pruning alone reads all of February (4 files); the zone
    # map still bounds the list to a subset of the table
    assert pruned_files < total
    assert pruned_files <= plain_files
    assert plain_rows  # the window actually matched data

    # allparms shares the wiring
    ap = get_obs_timeseries_station_data_allparms(
        catalog, "ST_A", "2024-02-03 00:00:00", "2024-02-20 00:00:00",
        "nowcast.src")
    assert ap.count() == len(plain_rows)


def test_unparseable_bound_degrades_to_plain_read(spark, tmp_path):
    catalog = _env(spark, tmp_path)
    build_skipping(catalog, "gauge_data", range_cols=["time"])
    # '2024-2-3' is valid for the Spark cast (reference Postgres accepts
    # it) but not for the driver-side ISO parse: skipping must bow out,
    # results must still be correct
    loose = get_obs_timeseries_station_data(
        catalog, "ST_A", "2024-2-3", "2024-2-20")
    strict = get_obs_timeseries_station_data(
        catalog, "ST_A", "2024-02-03 00:00:00", "2024-02-20 00:00:00")
    assert sorted(map(tuple, loose.collect())) == \
        sorted(map(tuple, strict.collect()))


def test_stale_sidecar_keeps_new_files(spark, tmp_path):
    """Files appended after the stats build are KEPT unconditionally —
    a stale zone map reads more, never less."""
    catalog = _env(spark, tmp_path)
    build_skipping(catalog, "gauge_data", range_cols=["time"])
    late = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 10, 5),
          99.0, None, None, None, None, None)],
        "source_id long, timemark timestamp_ntz, time timestamp_ntz, "
        "water_level double, wave_height double, wind_speed double, "
        "air_pressure double, stream_elevation double, flow_volume double")
    # bypass the auto-refresh hook to simulate staleness
    (late.withColumn("time_bucket", F.date_format("time", "yyyy-MM"))
     .coalesce(1).write.mode("append").partitionBy("time_bucket")
     .parquet(catalog.path("gauge_data")))
    got = get_obs_timeseries_station_data(
        catalog, "ST_A", "2024-02-10 00:00:00", "2024-02-10 12:00:00")
    vals = {r["tidal_gauge_water_level"] for r in got.collect()}
    assert 99.0 in vals
    # sanity: the sidecar is indeed stale (fewer stats rows than files)
    stats_files = {r.file for r in catalog.read(zm_table("gauge_data"))
                   .select("file").collect()}
    assert len(stats_files) < len(
        list_parquet_files(catalog.path("gauge_data")))
