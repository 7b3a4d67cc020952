"""JSONL document corpus source/sink — the interchange format LLM
training corpora actually arrive in (one JSON object per line, usually
gzipped, frequently containing malformed lines).

Read path design:

- **Declared schema, never inferred.** Schema inference scans the data
  twice and silently unifies drifting types; at 100 TB that is a full
  extra pass. Callers pass (or take the default) document schema.
- **PERMISSIVE + captured corrupt records.** One bad line must not kill
  a distributed read (the same ANSI lesson as the harvest CSVs). Bad
  lines land in ``_corrupt_record`` and are split into a quarantine
  frame the caller can ledger, count, or alert on — never silently
  dropped, never fatal.
- **Compression is free.** Spark's text source handles ``.gz``/``.zst``
  members transparently; gzipped JSONL is NOT splittable, so the shard
  size chosen at write time IS the read parallelism at train time —
  which is why the sink targets a configurable docs-per-shard.

Write path: ``write_jsonl_sharded`` repartitions to ceil(n/docs_per_
shard) hash partitions before the line-JSON write, so output shards are
uniformly sized regardless of upstream partitioning — the property
loaders (and un-splittable gzip) care about.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: default corpus document schema (id + text + provenance)
DOCUMENT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("text", StringType()),
    StructField("source", StringType()),
    StructField("url", StringType()),
])


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: StructType = DOCUMENT_SCHEMA,
                         ) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus. Returns ``(docs, quarantine)``: parsed rows
    with the declared schema, and the raw text of unparseable lines.

    ``docs`` uses DROPMALFORMED (bad lines excluded from the parse);
    the quarantine frame re-surfaces exactly those lines from a SEPARATE
    text-source lineage (``from_json`` + its corrupt-record option).
    Two lineages because Spark forbids queries whose referenced columns
    are only a JSON scan's internal ``_corrupt_record``
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — even a
    ``docs.count()`` after a corrupt-null filter trips it — and the
    cache-the-scan workaround would pin the corpus in memory. The text
    lineage costs a second read only when the caller actually evaluates
    quarantine."""
    docs = (spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path))
    with_cr = StructType(
        list(schema.fields) + [StructField("__cr", StringType())])
    quarantine = (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .filter(F.from_json(
            F.col("value"), with_cr,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__cr"}
        )["__cr"].isNotNull())
        .select(F.col("value").alias("raw_line"))
    )
    return docs, quarantine


def write_jsonl_sharded(df: DataFrame, path: str, *,
                        docs_per_shard: int = 50_000,
                        compression: str | None = "gzip",
                        known_count: int | None = None) -> int:
    """Write a corpus as uniformly-sized JSONL shards; returns the shard
    count. ``known_count`` skips the count job when the caller already
    has it (e.g. from an attrition report).

    Round-robin repartition (no keys) gives equal-size shards; gzip'd
    JSONL is not splittable, so shard size = train-time read parallelism.
    """
    n = known_count if known_count is not None else df.count()
    shards = max(1, math.ceil(n / docs_per_shard))
    w = df.repartition(shards).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return shards
