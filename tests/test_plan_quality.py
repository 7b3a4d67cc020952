"""Plan-quality regression guards: the optimizations we rely on at scale
must stay visible in the physical plan (pushdown, broadcast, no
sort-merge joins where dims should broadcast)."""

from __future__ import annotations

import contextlib
import io

import pytest

from apsviz_timeseriesdb_ingest_spark import suite

QUERIES = suite.all_queries()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_p1_filters_pushed(spark, sf_small):
    plan = _plan(QUERIES["p1_equality_filter"](spark, sf_small))
    assert "PushedFilters" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThan" in plan  # shipdate bound reaches the scan


def test_q5_all_dims_broadcast(spark, sf_small):
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never sort-merge


def test_q1_partial_aggregation(spark, sf_small):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_small))
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_pivot_no_distinct_prejob(spark, sf_small):
    # explicit pivot values -> a single agg pipeline, no extra collect job
    df = QUERIES["x1_event_pivot"](spark, sf_small)
    assert len(df.columns) == 6  # day + 5 fixed categories, schema constant-folded


@pytest.mark.parametrize("name", ["j1_dim_broadcast_join", "j4_anti_join", "j8_semi_join"])
def test_join_queries_use_broadcast(name, spark, sf_small):
    plan = _plan(QUERIES[name](spark, sf_small))
    assert "Broadcast" in plan
