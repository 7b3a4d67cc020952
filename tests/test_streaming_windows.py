"""Streaming window/stateful operators: tumbling windows with late data,
session windows, applyInPandasWithState running counters."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.streaming.windowed import (
    running_user_counts,
    session_event_stats,
    windowed_event_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(T0 + dt.timedelta(minutes=m), u, e, v) for m, u, e, v in rows],
        "ts timestamp, user_id long, event_type string, value double")


def _stream_dir(spark, tmp, rows, name):
    path = str(tmp / name)
    _events(spark, rows).write.mode("overwrite").parquet(path)
    return (spark.readStream
            .schema("ts timestamp, user_id long, event_type string, value double")
            .parquet(path))


BATCH1 = [(0, 1, "click", 1.0), (10, 1, "click", 2.0), (70, 1, "view", 3.0),
          (65, 2, "click", 4.0)]


def test_windowed_batch_semantics(spark):
    # windows are lineage-identical in batch mode; assert the layout there
    out = windowed_event_stats(_events(spark, BATCH1), window="1 hour")
    rows = {(str(r.window_start), r.event_type): (r.n_events, float(r.sum_value))
            for r in out.collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01 01:00:00", "view")] == (1, 3.0)
    assert rows[("2024-01-01 01:00:00", "click")] == (1, 4.0)


def test_session_windows_batch(spark):
    out = session_event_stats(_events(spark, BATCH1), gap="30 minutes")
    rows = {(r.user_id, str(r.session_start)): (r.n_events, str(r.session_end))
            for r in out.collect()}
    # user 1: events at 0,10 in one session (gap 60 to the third)
    assert rows[(1, "2024-01-01 00:00:00")][0] == 2
    assert rows[(1, "2024-01-01 01:10:00")][0] == 1
    assert rows[(2, "2024-01-01 01:05:00")][0] == 1


def test_windowed_stream_with_watermark(spark, tmp_path):
    stream = _stream_dir(spark, tmp_path, BATCH1, "ev1")
    q = (windowed_event_stats(stream, window="1 hour", watermark="2 hours")
         .writeStream.format("memory").queryName("win_agg")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {(str(r.window_start), r.event_type): r.n_events
            for r in spark.sql("SELECT * FROM win_agg").collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == 2


def test_running_user_counts_stateful(spark, tmp_path):
    stream = _stream_dir(spark, tmp_path, BATCH1, "ev2")
    q = (running_user_counts(stream)
         .writeStream.format("memory").queryName("running_counts")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r.user_id: (r.batch_events, r.total_events)
            for r in spark.sql("SELECT * FROM running_counts").collect()}
    assert rows[1] == (3, 3)
    assert rows[2] == (1, 1)


def test_windowed_term_counts_batch_and_stream(spark, tmp_path):
    """Term counts per tumbling window, identical lineage batch and
    streaming; late doc inside the watermark updates its window."""
    from apsviz_timeseriesdb_ingest_spark.streaming.windowed import (
        windowed_term_counts,
    )

    rows = [(0, "the cat sat"), (10, "the dog ran"),
            (70, "cat cat nap")]
    docs = spark.createDataFrame(
        [(T0 + dt.timedelta(minutes=m), t) for m, t in rows],
        "ts timestamp, text string")
    out = {(str(r.window_start), r.term): r.n
           for r in windowed_term_counts(docs, window="1 hour").collect()}
    assert out[("2024-01-01 00:00:00", "the")] == 2
    assert out[("2024-01-01 00:00:00", "cat")] == 1
    assert out[("2024-01-01 01:00:00", "cat")] == 2
    assert ("2024-01-01 01:00:00", "the") not in out

    path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(path)
    stream = (spark.readStream.schema("ts timestamp, text string")
              .parquet(path))
    q = (windowed_term_counts(stream, window="1 hour")
         .writeStream.format("memory").queryName("terms")
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {(str(r.window_start), r.term): r.n
           for r in spark.sql("SELECT * FROM terms").collect()}
    assert got == out
