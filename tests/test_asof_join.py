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


def test_asof_plan_single_shuffle_no_range_join(spark):
    obs, fc = _frames(spark)
    plan = asof_join(fc, obs, on=["station"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share the key
