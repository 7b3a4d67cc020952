"""Stream-stream correlate join: batch-mode semantics, true streaming
run over two file sources, cross-micro-batch pairing."""

from __future__ import annotations

import datetime as dt

from apsviz_timeseriesdb_ingest_spark.streaming.windowed import (
    correlate_streams,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = "ts timestamp, user_id long, event_type string, value double"


def _rows(rows):
    return [(T0 + dt.timedelta(minutes=m), u, e, v) for m, u, e, v in rows]


def _events(spark, rows):
    return spark.createDataFrame(_rows(rows), SCHEMA)


def test_correlate_batch_semantics(spark):
    clicks = _events(spark, [(0, 1, "click", 1.0), (300, 1, "click", 2.0),
                             (0, 2, "click", 3.0)])
    buys = _events(spark, [(30, 1, "purchase", 10.0),    # within 1h of click@0
                           (90, 1, "purchase", 20.0),    # 90min after: out
                           (290, 2, "purchase", 30.0)])  # 290min after: out
    out = correlate_streams(clicks, buys, within="1 hour")
    pairs = {(r.user_id, r.l_value, r.r_value) for r in out.collect()}
    assert pairs == {(1, 1.0, 10.0)}


def test_correlate_streaming_cross_batch(spark, tmp_path):
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _events(spark, [(0, 1, "click", 1.0)]).write.mode("append").parquet(l_dir)
    _events(spark, [(30, 1, "purchase", 10.0)]).write.mode("append").parquet(r_dir)

    def run_once():
        l_s = spark.readStream.schema(SCHEMA).parquet(l_dir)
        r_s = spark.readStream.schema(SCHEMA).parquet(r_dir)
        q = (correlate_streams(l_s, r_s, within="1 hour")
             .select("user_id", "l_ts", "r_ts", "l_value", "r_value")
             .writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    run_once()
    # second micro-batch: a purchase matching the FIRST batch's click —
    # the buffered left row must still be in state (watermark not passed)
    _events(spark, [(45, 1, "purchase", 20.0),
                    (200, 1, "purchase", 99.0)]).write.mode("append").parquet(r_dir)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    pairs = {(r.user_id, r.l_value, r.r_value) for r in rows}
    assert pairs == {(1, 1.0, 10.0), (1, 1.0, 20.0)}
