"""DeltaMerge seam: the transactional-merge binding cannot execute in
this container (no delta-spark), but its MERGE construction — the ON
clause, the whenMatched tuple-compare over surviving order columns, the
name-only order_by contract — is pure logic and is exercised here
against a fake DeltaTable. Reference semantics: the concurrent
UPDATE/DELETE keep-latest flow of run/ingestObsTasks.py:45-56,405-409."""

from __future__ import annotations

import sys
import types
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog, DeltaMerge

SCHEMA = ("source_id int, time timestamp_ntz, timemark timestamp_ntz, "
          "__file_dt timestamp_ntz, water_level double")


class _FakeMergeBuilder:
    def __init__(self, rec):
        self.rec = rec

    def whenMatchedUpdateAll(self, condition=None):
        self.rec["matched_condition"] = condition
        return self

    def whenNotMatchedInsertAll(self):
        self.rec["insert_all"] = True
        return self

    def execute(self):
        self.rec["executed"] = True


class _FakeTarget:
    def __init__(self, rec):
        self.rec = rec

    def alias(self, a):
        self.rec["tgt_alias"] = a
        return self

    def merge(self, src, on):
        self.rec["on"] = on
        self.rec["src_columns"] = src.columns
        return _FakeMergeBuilder(self.rec)


def _install_fake_delta(monkeypatch, rec, is_delta=True):
    class FakeDeltaTable:
        @classmethod
        def isDeltaTable(cls, spark, path):
            rec["probed_path"] = path
            return is_delta

        @classmethod
        def forPath(cls, spark, path):
            return _FakeTarget(rec)

    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = FakeDeltaTable
    delta_mod = types.ModuleType("delta")
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)


def _incoming(spark):
    t = datetime(2024, 3, 1, 12, 0)
    return spark.createDataFrame(
        [(1, t, t, t, 1.5), (1, t, t, t, 2.5)], SCHEMA)


def test_merge_condition_uses_surviving_order_names(spark, tmp_path, monkeypatch):
    rec = {}
    _install_fake_delta(monkeypatch, rec)
    cat = Catalog(spark, str(tmp_path), merge_strategy=DeltaMerge())
    cat.merge_keep_latest(
        "gauge_data", _incoming(spark), keys=["source_id", "time"],
        order_by=["timemark", "__file_dt"], time_col="time",
        drop_before_write=["__file_dt"])
    assert rec["on"] == "tgt.source_id <=> src.source_id AND tgt.time <=> src.time"
    # __file_dt is batch-transient (dropped before write) so the stored
    # row has no such column: only the surviving prefix is compared
    assert rec["matched_condition"] == "struct(src.timemark) >= struct(tgt.timemark)"
    assert rec["insert_all"] and rec["executed"]
    # keep-latest dedup ran before the merge: one winner per key
    assert "__file_dt" not in rec["src_columns"]


def test_merge_condition_true_when_no_order_survives(spark, tmp_path, monkeypatch):
    rec = {}
    _install_fake_delta(monkeypatch, rec)
    cat = Catalog(spark, str(tmp_path), merge_strategy=DeltaMerge())
    cat.merge_keep_latest(
        "gauge_data", _incoming(spark), keys=["source_id", "time"],
        order_by=["__file_dt"], time_col="time",
        drop_before_write=["__file_dt"])
    # all tie-breaks were transient -> incoming always wins (the
    # reference's last-loaded-wins)
    assert rec["matched_condition"] == "true"


def test_column_expression_order_by_is_rejected(spark, tmp_path, monkeypatch):
    rec = {}
    _install_fake_delta(monkeypatch, rec)
    cat = Catalog(spark, str(tmp_path), merge_strategy=DeltaMerge())
    with pytest.raises(TypeError, match="column NAMES"):
        cat.merge_keep_latest(
            "gauge_data", _incoming(spark), keys=["source_id", "time"],
            order_by=[F.col("timemark").desc()], time_col="time",
            drop_before_write=())


def _real_delta_available() -> bool:
    """True only when genuine delta-spark is importable (not the fake
    module these tests monkeypatch in)."""
    try:
        import delta.tables  # noqa: F401
        import importlib.metadata
        importlib.metadata.version("delta-spark")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _real_delta_available(),
                    reason="delta-spark not installed (offline sandbox; "
                           "install attempt documented in NOTES_r4)")
def test_real_delta_keep_latest_parity(tmp_path):
    """Deployment-only branch (r3 verdict task 3): with genuine
    delta-spark on the classpath, DeltaMerge.merge_keep_latest must
    produce the same surviving rows as DynamicOverwriteMerge on the
    overlap fixture (run/ingestObsTasks.py:45-56 semantics: newest
    timemark wins per (source_id, time), last-loaded wins ties).
    Builds its own Delta-enabled session — the shared fixture session
    lacks the Delta SQL extensions."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.master("local[4]")
               .appName("delta-parity")
               .config("spark.sql.extensions",
                       "io.delta.sql.DeltaSparkSessionExtension")
               .config("spark.sql.catalog.spark_catalog",
                       "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    dspark = configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        t1 = datetime(2024, 3, 1, 12, 0)
        t2 = datetime(2024, 3, 1, 18, 0)
        batch1 = dspark.createDataFrame(
            [(1, t1, t1, t1, 1.0), (2, t1, t1, t1, 2.0)], SCHEMA)
        batch2 = dspark.createDataFrame(
            [(1, t1, t2, t2, 9.0),   # newer timemark: must replace
             (3, t1, t1, t1, 3.0)],  # new key: must insert
            SCHEMA)
        results = {}
        for name, strat in (("delta", DeltaMerge()),
                            ("parquet", None)):
            cat = Catalog(dspark, str(tmp_path / name),
                          merge_strategy=strat)
            for b in (batch1, batch2):
                cat.merge_keep_latest(
                    "gauge_data", b, keys=["source_id", "time"],
                    order_by=["timemark", "__file_dt"], time_col="time",
                    drop_before_write=["__file_dt"])
            reader = (dspark.read.format("delta") if name == "delta"
                      else dspark.read)
            rows = reader.load(str(tmp_path / name / "gauge_data")) \
                if name == "delta" else \
                dspark.read.parquet(str(tmp_path / name / "gauge_data"))
            results[name] = {(r.source_id, r.time, r.timemark,
                              r.water_level) for r in rows.collect()}
        assert results["delta"] == results["parquet"]
        assert {(k[0], k[3]) for k in results["delta"]} == \
            {(1, 9.0), (2, 2.0), (3, 3.0)}
    finally:
        dspark.stop()
