"""Every suite query must match its DuckDB oracle (the driver's t2 gate)."""

from __future__ import annotations

import pytest

from apsviz_timeseriesdb_ingest_spark import suite

from .oracle_harness import compare, duckdb_conn

QUERIES = suite.all_queries()
ORACLES = suite.all_oracles()


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_conn(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_oracle, con):
    df = QUERIES[name](spark, sf_oracle)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    problems = compare(df, con, ORACLES[name], name=name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # non-SQL-expressible ops are allowed to omit oracles; keep the list
    # explicit so additions are conscious decisions
    allowed_missing = set()
    assert set(missing) <= allowed_missing, f"queries without oracle: {missing}"


def test_registry_respects_driver_cap():
    # the driver records CORRECTNESS rows for at most 50 queries; r1
    # registered 52 and the overflow pair was silently never verified.
    # Adding a query must FOLD an existing one, not exceed the cap.
    assert len(QUERIES) == 50, (
        f"{len(QUERIES)} queries registered; the driver caps at 50 — "
        "fold same-shape queries instead of exceeding the cap")
