"""Bucketed co-located joins: same-key same-count bucketed tables join
without shuffling either side."""

from __future__ import annotations

import contextlib
import io

from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.testdata import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark, sf_small, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders")
    catalog.save_bucketed(li, "li_bucketed", bucket_by=["l_orderkey"],
                          num_buckets=8, sort_by=["l_orderkey"])
    catalog.save_bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
                          "o_bucketed", bucket_by=["l_orderkey"],
                          num_buckets=8, sort_by=["l_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = catalog.read_table("li_bucketed").join(
            catalog.read_table("o_bucketed"), "l_orderkey")
        plan = _plan(joined)
        # co-located: a sort-merge join with zero exchanges
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_salted_join_equals_plain_join(spark, sf_small):
    """salted_join result is exactly the plain inner join — the salt
    only reshapes the shuffle (j9's gate row left in r3 for the driver
    50-query cap; this is its standing equivalence coverage)."""
    from pyspark.sql import functions as F

    from apsviz_timeseriesdb_ingest_spark.operators.salt import salted_join

    ev = load_table(spark, sf_small, "events")
    right = (load_table(spark, sf_small, "orders")
             .filter(F.col("o_orderkey") < 150)
             .select(F.col("o_orderkey").alias("user_id"), "o_totalprice"))
    got = sorted(map(tuple, salted_join(ev, right, ["user_id"])
                 .select("user_id", "event_id", "o_totalprice").collect()))
    exp = sorted(map(tuple, ev.join(right, "user_id")
                 .select("user_id", "event_id", "o_totalprice").collect()))
    assert got == exp and got
