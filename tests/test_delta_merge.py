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
