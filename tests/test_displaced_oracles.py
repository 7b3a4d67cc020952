"""Every query displaced from the 50-row driver gate (``gate=False`` in
the suite registries) keeps FULL oracle parity coverage here: the same
DuckDB side-by-side multiset compare the driver performs, at the
driver's scale factor. Displacement changes where a query is checked,
never whether."""

from __future__ import annotations

import datetime as dt
import decimal
from collections import Counter

import duckdb
import pytest

from apsviz_timeseriesdb_ingest_spark import suite

DISPLACED = sorted(suite.displaced_queries())


def _norm(v):
    # the driver's representation-sensitive normalization (exact float
    # reprs, no rounding) — see tools/drive_driver.py
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def test_every_displaced_query_has_an_oracle():
    assert set(suite.displaced_oracles()) == set(suite.displaced_queries())


def test_gate_is_exactly_fifty():
    """The driver caps at 50 queries; the registry must fill the gate
    exactly (fewer wastes rows, more silently drops the tail — the r1
    failure mode)."""
    assert len(suite.all_queries()) == 50
    assert set(suite.all_queries()).isdisjoint(suite.displaced_queries())


@pytest.mark.parametrize("name", DISPLACED)
def test_displaced_query_matches_oracle(spark, sf_oracle, name):
    qfn = suite.displaced_queries()[name]
    sql = suite.displaced_oracles()[name]
    sdf = qfn(spark, sf_oracle)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_oracle}/{t}.parquet'")
    rel = con.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    do = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    assert [scols[i].lower() for i in so] == [dcols[i].lower() for i in do]
    assert len(srows) == len(drows)
    ms = Counter(tuple(_norm(r[i]) for i in so) for r in srows)
    md = Counter(tuple(_norm(r[i]) for i in do) for r in drows)
    assert ms == md, (f"spark-only={list((ms - md).items())[:3]} "
                      f"duck-only={list((md - ms).items())[:3]}")
