"""The driver-facing query suite.

Each module defines QUERIES (name -> fn(spark, sf_dir) -> DataFrame) and
ORACLES (name -> DuckDB-runnable ANSI SQL). Names are prefixed with the
SURVEY.md section-2 operator id they exercise so coverage is auditable
line-by-line.
"""

from __future__ import annotations

from . import llmdata, relational


def all_queries():
    out = {}
    out.update(relational.QUERIES)
    out.update(llmdata.QUERIES)
    return out


def all_oracles():
    out = {}
    out.update(relational.ORACLES)
    out.update(llmdata.ORACLES)
    return out


def displaced_queries():
    """Queries rotated OUT of the 50-row driver gate (registered with
    ``gate=False``) — still implemented, still oracle-checked in pytest
    (``tests/test_displaced_oracles.py``)."""
    out = {}
    out.update(relational.query.displaced_queries)
    out.update(llmdata.query.displaced_queries)
    return out


def displaced_oracles():
    out = {}
    out.update(relational.query.displaced_oracles)
    out.update(llmdata.query.displaced_oracles)
    return out
