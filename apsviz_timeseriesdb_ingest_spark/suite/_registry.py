"""Shared registry plumbing for suite modules."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..session import ensure_runtime_conf
from ..testdata import load_table


def make_registry():
    queries: dict = {}
    oracles: dict = {}

    def query(name: str, sql: str | None = None):
        def deco(fn):
            queries[name] = fn
            if sql is not None:
                oracles[name] = sql
            return fn
        return deco

    return queries, oracles, query


def tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load testdata tables with deterministic session conf applied."""
    ensure_runtime_conf(spark)
    loaded = [load_table(spark, sf_dir, n) for n in names]
    return loaded[0] if len(loaded) == 1 else loaded
