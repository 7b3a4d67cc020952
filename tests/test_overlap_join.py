"""Bucketized interval-overlap join: semantics, DuckDB range-join
parity, bucket-size invariance, and plan shape (equi-join, no
nested-loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.operators.rangejoin import overlap_join
from apsviz_timeseriesdb_ingest_spark.testdata import load_table
from tests.oracle_harness import compare, duckdb_conn

T0 = dt.datetime(2024, 1, 1)


def _iv(spark, rows, id_name):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(hours=b), T0 + dt.timedelta(hours=e))
         for i, b, e in rows],
        f"{id_name} long, begin timestamp_ntz, end timestamp_ntz")


def test_overlap_semantics(spark):
    left = _iv(spark, [(1, 0, 2), (2, 5, 6), (3, 10, 11)], "lid")
    right = _iv(spark, [(10, 1, 3), (20, 6, 7), (30, 20, 21)], "rid")
    out = overlap_join(left, right, left_begin="begin", left_end="end",
                       right_begin="begin", right_end="end",
                       left_id="lid", right_id="rid", bucket="1 hour")
    pairs = {(r.lid, r.rid) for r in out.collect()}
    # 1x10 overlap [1,2]; 2x20 touch at hour 6 (inclusive); 3 matches none
    assert pairs == {(1, 10), (2, 20)}
    strict = overlap_join(left, right, left_begin="begin", left_end="end",
                          right_begin="begin", right_end="end",
                          left_id="lid", right_id="rid", bucket="1 hour",
                          inclusive=False)
    assert {(r.lid, r.rid) for r in strict.collect()} == {(1, 10)}


def test_overlap_bucket_size_invariance(spark):
    left = _iv(spark, [(i, i, i + 3) for i in range(0, 50, 2)], "lid")
    right = _iv(spark, [(100 + i, i + 1, i + 2) for i in range(0, 50, 3)], "rid")

    def run(bucket):
        return {(r.lid, r.rid) for r in overlap_join(
            left, right, left_begin="begin", left_end="end",
            right_begin="begin", right_end="end",
            left_id="lid", right_id="rid", bucket=bucket).collect()}

    a, b, c = run("1 hour"), run("6 hours"), run("2 days")
    assert a == b == c and a


def test_overlap_duckdb_parity(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", F.col("ts").alias("begin"),
                      (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end")))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("buy_id"), "user_id",
                    F.col("ts").alias("begin"),
                    (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end")))
    out = overlap_join(clicks, buys, left_begin="begin", left_end="end",
                       right_begin="begin", right_end="end",
                       left_id="event_id", right_id="buy_id",
                       on=["user_id"], bucket="1 hour"
                       ).select("event_id", "buy_id", "user_id")
    sql = """
        WITH c AS (SELECT event_id, user_id, ts AS b,
                          ts + INTERVAL 2 HOUR AS e FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT event_id AS buy_id, user_id, ts AS b,
                     ts + INTERVAL 1 HOUR AS e FROM events
              WHERE event_type = 'purchase')
        SELECT c.event_id, p.buy_id, c.user_id
        FROM c JOIN p ON c.user_id = p.user_id
         AND c.b <= p.e AND p.b <= c.e
    """
    compare(out, duckdb_conn(sf_oracle), sql, name="overlap_join")


def test_overlap_rejects_ambiguous_ids(spark):
    import pytest

    left = _iv(spark, [(1, 0, 2)], "rid")  # same id name both sides
    right = _iv(spark, [(10, 1, 3)], "rid")
    with pytest.raises(ValueError, match="collides"):
        overlap_join(left, right, left_begin="begin", left_end="end",
                     right_begin="begin", right_end="end",
                     left_id="rid", right_id="rid")


def test_overlap_plan_no_nested_loop(spark):
    left = _iv(spark, [(1, 0, 2)], "lid")
    right = _iv(spark, [(10, 1, 3)], "rid")
    plan = overlap_join(left, right, left_begin="begin", left_end="end",
                        right_begin="begin", right_end="end",
                        left_id="lid", right_id="rid")._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
