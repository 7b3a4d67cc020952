"""Catalog maintenance: compaction heals small files without changing
data; streaming dedup-within-watermark drops cross-batch duplicates."""

from __future__ import annotations

import datetime as dt
import os
from glob import glob

from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.streaming.windowed import dedup_within_watermark
from pyspark.sql import functions as F


def _parquet_files(path: str) -> int:
    return len(glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def test_compact_preserves_data(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    rows = [(i, dt.datetime(2024, 1 + i % 2, 1), float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, time timestamp_ntz, v double")
    # many tiny appends -> many tiny files
    for chunk in range(5):
        part = df.filter(F.col("id") % 5 == chunk)
        catalog.append(part.withColumn("time_bucket",
                                       F.date_format("time", "yyyy-MM")),
                       "facts", partition_by=["time_bucket"])
    before_files = _parquet_files(catalog.path("facts"))
    before = sorted(map(tuple, catalog.read("facts").drop("time_bucket").collect()))
    catalog.compact("facts")
    after_files = _parquet_files(catalog.path("facts"))
    after = sorted(map(tuple, catalog.read("facts").drop("time_bucket").collect()))
    assert after == before
    assert after_files < before_files


def test_dedup_within_watermark_stream(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(minutes=m), eid, v) for m, eid, v in
            [(0, 1, 1.0), (1, 2, 2.0), (2, 1, 99.0), (3, 3, 3.0), (4, 2, 98.0)]]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, "ts timestamp, event_id long, value double") \
        .write.parquet(path)
    stream = spark.readStream.schema("ts timestamp, event_id long, value double") \
        .parquet(path)
    q = (dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
         .writeStream.format("memory").queryName("dedup_wm")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT event_id, count(*) AS n FROM dedup_wm GROUP BY event_id")
    assert {(r.event_id, r.n) for r in got.collect()} == {(1, 1), (2, 1), (3, 1)}
