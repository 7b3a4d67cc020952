"""Shared registry plumbing for suite modules."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..session import ensure_runtime_conf
from ..testdata import load_table


def make_registry():
    """Registry for a suite module. ``gate=False`` registers a query as
    DISPLACED: implemented and oracle-checked (pytest runs every
    displaced query against its DuckDB oracle — ``tests/
    test_displaced_oracles.py``) but not shipped to the driver gate,
    which caps at 50 queries per round. Displaced entries live on the
    decorator (``query.displaced_queries`` / ``.displaced_oracles``)."""
    queries: dict = {}
    oracles: dict = {}

    def query(name: str, sql: str | None = None, gate: bool = True):
        def deco(fn):
            (queries if gate else query.displaced_queries)[name] = fn
            if sql is not None:
                (oracles if gate else query.displaced_oracles)[name] = sql
            return fn
        return deco

    query.displaced_queries = {}
    query.displaced_oracles = {}
    return queries, oracles, query


def tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load testdata tables with deterministic session conf applied."""
    ensure_runtime_conf(spark)
    loaded = [load_table(spark, sf_dir, n) for n in names]
    return loaded[0] if len(loaded) == 1 else loaded
