"""Parquet-backed table catalog with partition-bounded keep-latest merges.

The reference's sink is Postgres COPY + DELETE-dedup + UPDATE flags
(SURVEY section 2.1 S5, 2.8 M2/M3). Here every table is a partitioned
parquet directory and the mutation verbs become:

    append            -- COPY
    overwrite         -- CREATE TABLE AS
    merge_keep_latest -- COPY + bounded DELETE-dedup, as one atomic-ish
                         dynamic-partition overwrite
    update            -- ledger flag flips (read-modify-write of the tiny
                         ledger table)

Scale design: fact tables are partitioned by a derived time bucket
(``yyyy-MM`` of the event time). ``merge_keep_latest`` only reads and
rewrites the partitions the incoming batch touches (dynamic partition
overwrite) — the cost is proportional to the batch's time window, never
the table, which is the reference's bounded-DELETE optimization
(``run/ingestObsTasks.py:390-399``) expressed as partition pruning. On a
real deployment this maps 1:1 onto Delta/Iceberg MERGE; plain parquet
keeps this repo dependency-free.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import keep_latest

#: partition column derived from event time for fact tables
TIME_BUCKET = "time_bucket"


def time_bucket(col: str = "time") -> Column:
    return F.date_format(col, "yyyy-MM").alias(TIME_BUCKET)


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str, schema: StructType | None = None) -> DataFrame:
        if not self.exists(table) and schema is not None:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str, *, partition_by: Sequence[str] = ()) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, *, partition_by: Sequence[str] = ()) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def merge_keep_latest(self, table: str, incoming: DataFrame,
                          keys: Sequence[str], order_by: Sequence[Column],
                          *, time_col: str = "time",
                          drop_before_write: Sequence[str] = ()) -> None:
        """Upsert ``incoming`` with keep-latest semantics, touching only the
        time-bucket partitions present in the batch.

        ``drop_before_write``: transient ordering helper columns present
        only on the incoming side (e.g. source file identity used as a
        dedup tie-break). The stored side joins in with nulls there, so
        ``order_by`` on them must tolerate nulls (desc puts nulls last —
        incoming wins ties, i.e. last-loaded-wins, like the reference's
        serial-id tie-break).
        """
        incoming = incoming.withColumn(TIME_BUCKET, time_bucket(time_col))
        if not self.exists(table):
            deduped = (keep_latest(incoming, keys, order_by).drop(*drop_before_write)
                       .sortWithinPartitions(*keys))
            self.overwrite(deduped, table, partition_by=[TIME_BUCKET])
            return
        months = [r[0] for r in incoming.select(TIME_BUCKET).distinct().collect()]
        existing = self.read(table).filter(F.col(TIME_BUCKET).isin(months))
        merged = keep_latest(
            existing.unionByName(incoming, allowMissingColumns=True), keys, order_by,
        ).drop(*drop_before_write)
        # cluster rows by the dedup keys inside each file: parquet
        # row-group min/max stats then skip for key-selective reads
        merged = merged.sortWithinPartitions(*keys)
        # Materialize before writing: the write target is also the read
        # source; breaking lineage avoids read-your-own-overwrite. (A real
        # deployment uses Delta/Iceberg MERGE and skips this.)
        merged = merged.localCheckpoint(eager=True)
        (merged.write.mode("overwrite").partitionBy(TIME_BUCKET)
         .parquet(self.path(table)))

    def update(self, table: str, df: DataFrame) -> None:
        """Full-replace of a small control/ledger table (flag flips)."""
        df = df.localCheckpoint(eager=True)
        df.write.mode("overwrite").parquet(self.path(table))

    def compact(self, table: str, *, partitions: int | None = None) -> None:
        """Rewrite a table to heal the small-file problem incremental
        merges accumulate (many micro-batches → many tiny parquet files).
        Partitioned tables re-cluster on the partition column so each
        partition dir collapses to ~one file."""
        df = self.read(table)
        cols = df.columns
        n = partitions or self.spark.sparkContext.defaultParallelism
        df = df.localCheckpoint(eager=True)
        if TIME_BUCKET in cols:
            (df.repartition(n, TIME_BUCKET).write.mode("overwrite")
             .partitionBy(TIME_BUCKET).parquet(self.path(table)))
        else:
            df.coalesce(max(1, n // 8)).write.mode("overwrite").parquet(self.path(table))

    def save_bucketed(self, df: DataFrame, table: str, *, bucket_by: Sequence[str],
                      num_buckets: int = 32, sort_by: Sequence[str] = ()) -> None:
        """Write as a bucketed (+optionally sorted) session-catalog table.

        Two tables bucketed on their join key with the same bucket count
        join with NO shuffle on either side — the co-location strategy
        for repeated fact-fact joins at 100 TB (bucket metadata lives in
        the catalog; on a deployment that's Hive/Glue/Unity instead of
        the session catalog)."""
        w = (df.write.mode("overwrite").format("parquet")
             .option("path", self.path(table))
             .bucketBy(num_buckets, *bucket_by))
        if sort_by:
            w = w.sortBy(*sort_by)
        w.saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        """Read a session-catalog (possibly bucketed) table by name."""
        return self.spark.table(table)
