"""As-of join: semantics on hand-built frames, DuckDB ASOF JOIN parity
on the events table, tolerance, and plan shape (one shuffle, no range
join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.operators.asof import asof_join
from apsviz_timeseriesdb_ingest_spark.testdata import load_table
from tests.oracle_harness import compare, duckdb_conn

T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _frames(spark):
    obs = spark.createDataFrame(
        [("A", _ts(0), 1.0), ("A", _ts(30), 2.0), ("A", _ts(60), 3.0),
         ("B", _ts(10), 9.0)],
        "station string, ts timestamp_ntz, level double")
    fc = spark.createDataFrame(
        [("A", _ts(-5)), ("A", _ts(0)), ("A", _ts(45)), ("A", _ts(200)),
         ("B", _ts(10)), ("C", _ts(30))],
        "station string, ts timestamp_ntz")
    return obs, fc


def test_asof_semantics(spark):
    obs, fc = _frames(spark)
    out = asof_join(fc, obs, on=["station"])
    got = {(r.station, str(r.ts)): (r.level_asof,
                                    str(r.ts_asof) if r.ts_asof else None)
           for r in out.collect()}
    assert got[("A", "2024-01-01 00:00:00")] == (1.0, "2024-01-01 00:00:00")  # equal ts matches
    assert got[("A", "2023-12-31 23:55:00")] == (None, None)                  # nothing before
    assert got[("A", "2024-01-01 00:45:00")] == (2.0, "2024-01-01 00:30:00")  # latest before
    assert got[("A", "2024-01-01 03:20:00")] == (3.0, "2024-01-01 01:00:00")
    assert got[("B", "2024-01-01 00:10:00")] == (9.0, "2024-01-01 00:10:00")
    assert got[("C", "2024-01-01 00:30:00")] == (None, None)                  # unseen key


def test_asof_tolerance(spark):
    obs, fc = _frames(spark)
    out = asof_join(fc, obs, on=["station"], tolerance="'30' MINUTE")
    got = {(r.station, str(r.ts)): r.level_asof for r in out.collect()}
    assert got[("A", "2024-01-01 00:45:00")] == 2.0    # 15 min old: in
    assert got[("A", "2024-01-01 03:20:00")] is None   # 140 min old: out


def test_asof_duckdb_parity(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    left = (ev.filter(F.col("event_type") == "click")
            .select("user_id", "ts", "event_id"))
    right = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "value"))
    out = (asof_join(left, right, on=["user_id"])
           .select("user_id", "event_id",
                   F.col("ts").cast("string").alias("ts"),
                   F.col("ts_asof").cast("string").alias("ts_asof"),
                   F.round("value_asof", 6).alias("value_asof")))
    sql = """
        WITH l AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'click'),
        r AS (SELECT user_id, ts, value FROM events
              WHERE event_type = 'purchase')
        SELECT l.user_id, l.event_id,
               CAST(l.ts AS VARCHAR) AS ts,
               CAST(r.ts AS VARCHAR) AS ts_asof,
               round(r.value, 6) AS value_asof
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """
    compare(out, duckdb_conn(sf_oracle), sql, name="asof_join")


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas merge_asof (the de-facto reference
    semantic) on seeded random frames."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left = [("K%d" % rng.randint(0, 3), _ts(rng.randint(0, 500)))
            for _ in range(200)]
    right = [("K%d" % rng.randint(0, 3), _ts(rng.randint(0, 500)),
              float(i)) for i in range(150)]
    l_df = spark.createDataFrame(left, "k string, ts timestamp_ntz")
    r_df = spark.createDataFrame(right, "k string, ts timestamp_ntz, v double")
    got = {(r.k, r.ts): (r.ts_asof, r.v_asof)
           for r in asof_join(l_df, r_df, on=["k"]).collect()}

    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts")
    rp = (pd.DataFrame(right, columns=["k", "ts", "v"])
          .sort_values(["ts", "v"]))  # equal (k, ts): keep the LAST right
    rp["rts"] = rp["ts"]  # merge_asof drops the right 'on' column
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        suffixes=("", "_asof"))
    for row in exp.itertuples():
        e_ts = None if pd.isna(row.rts) else row.rts.to_pydatetime()
        e_v = None if pd.isna(row.v) else row.v
        g_ts, g_v = got[(row.k, row.ts.to_pydatetime())]
        assert g_ts == e_ts
        # equal-(k, ts) right rows are a genuine tie; both engines must
        # agree on the timestamp, the value may differ between tied rows
        if e_ts is not None:
            assert g_v is not None


def test_model_vs_obs_asof_domain(spark, tmp_path_factory):
    """Domain helper: every model point gets the latest gauge reading
    at-or-before it, across cadences the equal-time pivots cannot align."""
    from apsviz_timeseriesdb_ingest_spark.plans.bootstrap import bootstrap
    from apsviz_timeseriesdb_ingest_spark.plans.model_ingest import ModelIngest
    from apsviz_timeseriesdb_ingest_spark.plans.obs_ingest import ObsIngest
    from apsviz_timeseriesdb_ingest_spark.plans.read_api import (
        get_model_vs_obs_asof,
    )
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from tests.test_model_pipeline import PROPS, RUN_ID, _write

    root = tmp_path_factory.mktemp("asofenv")
    (root / "harvest").mkdir()
    _write(str(root / "stations.csv"),
           ["ST_A,34.1,-77.1,gmt,NOAA/NOS,Alpha,tidal,us,nc,NH,01A"])
    _write(str(root / "meta.csv"), [
        "data_source,source_name,source_archive,source_variable,"
        "filename_prefix,location_type,units",
        "tidal_gauge,noaa,noaa,water_level,noaa_stationdata_water_level,"
        "tidal,m"])
    catalog = Catalog(spark, str(root / "warehouse"))
    bootstrap(spark, catalog, station_csvs=[str(root / "stations.csv")],
              source_meta_csv=str(root / "meta.csv"))
    # obs on the half-hour
    _write(str(root / "harvest" /
               "noaa_stationdata_water_level_2024-01-01T14:00:00.csv"),
           ["STATION,TIME,WATER_LEVEL",
            "ST_A,2024-01-01 11:30:00,1.1",
            "ST_A,2024-01-01 12:30:00,1.2"])
    ObsIngest(spark, catalog, str(root / "harvest")).run_sequence_ingest()
    # model on the hour
    run_dir = root / "harvest" / RUN_ID
    run_dir.mkdir(parents=True)
    _write(str(run_dir / "FORECAST_NOAASTATIONS.csv"),
           ["STATION,TIME,WATER_LEVEL",
            "ST_A,2024-01-01 12:00:00,0.5",
            "ST_A,2024-01-01 13:00:00,0.6"])
    items = [(4420, "21ab3d_gfs", k, v) for k, v in PROPS.items()]
    config = spark.createDataFrame(
        items, "instance_id long, uid string, key string, value string")
    ModelIngest(spark, catalog, str(root / "harvest")).ingest_run(RUN_ID, config)

    out = get_model_vs_obs_asof(catalog, "ST_A", "2024-01-01 00:00:00",
                                "2024-01-02 00:00:00")
    rows = {str(r.time): (r.model_water_level, r.water_level_asof,
                          str(r.time_asof)) for r in out.collect()}
    assert rows == {
        "2024-01-01 12:00:00": (0.5, 1.1, "2024-01-01 11:30:00"),
        "2024-01-01 13:00:00": (0.6, 1.2, "2024-01-01 12:30:00"),
    }


def test_asof_plan_single_shuffle_no_range_join(spark):
    obs, fc = _frames(spark)
    plan = asof_join(fc, obs, on=["station"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share the key
