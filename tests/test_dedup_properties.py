"""Hypothesis property tests for the keep-latest dedup operator — the
engine's hardest correctness item (SURVEY section 7 'hard parts')."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.operators.dedup import keep_latest

_raw_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=5),   # version
        st.integers(min_value=0, max_value=10**4),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=1, max_size=40,
)

#: force globally-unique ids so the (version, id) order is total — ties on
#: the full ordering tuple would be legitimately nondeterministic
rows = _raw_rows.map(lambda xs: [(k, v, i * 100 + n, val)
                                 for n, (k, v, i, val) in enumerate(xs)])


@settings(max_examples=12, deadline=None)
@given(rows)
def test_keep_latest_matches_pandas(data):
    # pytest fixtures don't mix with @given; grab the active session
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()

    df = spark.createDataFrame(data, "key int, version int, id long, value double")
    got = sorted(map(tuple, keep_latest(
        df, ["key"], [F.col("version").desc(), F.col("id").desc()]).collect()))

    pdf = pd.DataFrame(data, columns=["key", "version", "id", "value"])
    idx = (pdf.sort_values(["version", "id"], ascending=False)
           .groupby("key", as_index=False).first())
    exp = sorted(map(tuple, idx[["key", "version", "id", "value"]].itertuples(index=False)))
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(rows, rows)
def test_merge_equals_one_shot(existing, incoming):
    """Merging batch B into a table built from batch A equals deduping
    A ∪ B in one pass — the incremental path loses nothing."""
    from pyspark.sql import SparkSession

    from apsviz_timeseriesdb_ingest_spark.operators.dedup import merge_keep_latest

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    schema = "key int, version int, id long, value double"
    order = [F.col("version").desc(), F.col("id").desc()]
    # disjoint id parity across batches keeps the total order tie-free
    existing = [(k, v, i * 2, val) for k, v, i, val in existing]
    incoming = [(k, v, i * 2 + 1, val) for k, v, i, val in incoming]
    a = keep_latest(spark.createDataFrame(existing, schema), ["key"], order)
    b = spark.createDataFrame(incoming, schema)
    merged = sorted(map(tuple, merge_keep_latest(a, b, ["key"], order).collect()))
    oneshot = sorted(map(tuple, keep_latest(
        spark.createDataFrame(existing + incoming, schema), ["key"], order).collect()))
    assert merged == oneshot
