"""Local re-implementation of the driver's DuckDB-oracle parity gate.

Runs a suite query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive multiset of normalized values.
"""

from __future__ import annotations

import datetime as dt
import decimal
from collections import Counter

import duckdb

from apsviz_timeseriesdb_ingest_spark.testdata import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    # EXACT representations, no float rounding: the driver's canonical
    # hash is representation-sensitive (r1 verdict: 10 hash_match
    # failures with equal-after-rounding values), so the local gate must
    # be at least as strict or it predicts nothing.
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql, *, name="query"):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    problems = []
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        ms, md = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
        if ms != md:
            only_s = list((ms - md).items())[:3]
            only_d = list((md - ms).items())[:3]
            problems.append(f"values differ; spark-only={only_s} duckdb-only={only_d}")
    return problems
