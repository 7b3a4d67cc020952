"""The ANN storage layout end-to-end: ann_assign writes a corpus
partitioned by IVF cell; probe queries read ONLY their probed cells
(partition pruning asserted in the plan) and return the same neighbors
the brute-force scan finds in the probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.llm.similarity import ann_assign
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
from apsviz_timeseriesdb_ingest_spark.testdata import load_table

CENTS = [1, 5, 9, 13]


def test_ann_layout_partition_pruned_probe(spark, sf_small, tmp_path):
    vecs = load_table(spark, sf_small, "embeddings")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    assign = ann_assign(vecs, dim=64, planes=4, centroid_ids=CENTS)
    layout = vecs.join(assign, "vec_id")
    catalog.overwrite(layout, "ann_corpus", partition_by=["centroid_id"])

    probe_cells = [CENTS[0], CENTS[1]]
    probed = catalog.read("ann_corpus").filter(
        F.col("centroid_id").isin(probe_cells))

    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters")[1][:200]

    # correctness: probed read == full corpus filtered to those cells
    expected = {r.vec_id for r in layout.filter(
        F.col("centroid_id").isin(probe_cells)).select("vec_id").collect()}
    got = {r.vec_id for r in probed.select("vec_id").collect()}
    assert got == expected and got

    # the layout covers the whole corpus exactly once
    assert catalog.read("ann_corpus").count() == vecs.count()


def test_ann_probe_reads_fewer_files(spark, sf_small, tmp_path):
    vecs = load_table(spark, sf_small, "embeddings")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    assign = ann_assign(vecs, dim=64, planes=4, centroid_ids=CENTS)
    catalog.overwrite(vecs.join(assign, "vec_id"), "ann_corpus",
                      partition_by=["centroid_id"])
    probed = catalog.read("ann_corpus").filter(F.col("centroid_id") == CENTS[0])
    full = catalog.read("ann_corpus")

    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()

    assert n_files(probed) < n_files(full)
