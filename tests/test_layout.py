"""Write-side clustering (sources/layout.py): range-shard and Z-order
layouts measured BY what they exist for — zone-map file skipping on the
resulting files — plus row preservation."""

from __future__ import annotations

import pyspark.sql.functions as F

from apsviz_timeseriesdb_ingest_spark.sources.layout import (
    cluster_write,
    zorder_key,
    zorder_write,
)
from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (
    collect_zonemap,
    list_parquet_files,
    prune_files,
    read_pruned,
)


def _grid(spark, n=100):
    """n x n integer grid — every (x, y) once."""
    return (spark.range(n * n)
            .select((F.col("id") % n).alias("x"),
                    (F.col("id") / n).cast("long").alias("y")))


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    """The Z-order selling point: files cover compact hyper-rectangles,
    so a selective predicate on EITHER column skips most files — where
    a plain sort only serves its leading key."""
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    df = _grid(spark)
    zorder_write(df, zpath, ["x", "y"], files=16)
    cluster_write(df, spath, ["x", "y"], files=16)

    total = df.count()
    for path in (zpath, spath):
        assert spark.read.parquet(path).count() == total  # rows preserved

    zzm = collect_zonemap(spark, zpath, ["x", "y"])
    szm = collect_zonemap(spark, spath, ["x", "y"])
    n_files = len(list_parquet_files(zpath))
    assert n_files == 16

    # leading-key pruning: both layouts skip
    assert len(prune_files(szm, "x", 0, 9)) <= 4
    z_on_x = prune_files(zzm, "x", 0, 9)
    assert len(z_on_x) <= n_files // 2
    # SECOND-key pruning: the sorted layout keeps everything (every
    # file spans the full y domain); the Z-order layout still skips
    assert len(prune_files(szm, "y", 0, 9)) == 16
    z_on_y = prune_files(zzm, "y", 0, 9)
    assert len(z_on_y) <= n_files // 2

    # pruning never changes results
    for col, keep in (("x", z_on_x), ("y", z_on_y)):
        pred = F.col(col).between(0, 9)
        got = (read_pruned(spark, zpath, keep).filter(pred)
               .agg(F.count("*"), F.sum("x"), F.sum("y")).collect()[0])
        exp = (df.filter(pred)
               .agg(F.count("*"), F.sum("x"), F.sum("y")).collect()[0])
        assert tuple(got) == tuple(exp)


def test_zorder_key_locality_and_degenerate_column(spark):
    """Morton-key sanity: neighbors in BOTH coordinates get nearby
    keys (locality), corners get extreme keys, and a constant column
    contributes nothing (no division by a zero span)."""
    df = _grid(spark, n=16)
    keyed = df.withColumn("z", zorder_key(df, ["x", "y"], bits=4))
    rows = {(r.x, r.y): r.z for r in keyed.collect()}
    assert rows[(0, 0)] == 0
    assert rows[(15, 15)] == 255          # all 8 interleaved bits set
    # x bits land in even positions, y in odd: (15, 0) = 0b01010101
    assert rows[(15, 0)] == 0b01010101
    assert rows[(0, 15)] == 0b10101010

    const = df.withColumn("c", F.lit(7))
    z = const.withColumn("z", zorder_key(const, ["x", "c"], bits=4))
    # the constant column collapses to cell 0 → key is just x's bits
    got = {(r.x, r.z) for r in z.select("x", "z").distinct().collect()}
    for x, zv in got:
        assert zv == sum(((x >> j) & 1) << (2 * j) for j in range(4))


def test_zorder_timestamp_dimension(spark, sf_small, tmp_path):
    """Timestamps normalize through the same min/max grid (cast to
    seconds) — the time+key layout a 100 TB event corpus would use."""
    from apsviz_timeseriesdb_ingest_spark.testdata import load_table

    ev = load_table(spark, sf_small, "events").select("ts", "user_id")
    path = str(tmp_path / "ev_z")
    zorder_write(ev, path, ["ts", "user_id"], files=8)
    lo, hi = 0, 3  # selective slice of the sf0.001 user_id domain [0, 14]
    zm = collect_zonemap(spark, path, ["ts", "user_id"])
    keep = prune_files(zm, "user_id", lo, hi)
    assert 0 < len(keep) < 8
    pred = F.col("user_id").between(lo, hi)
    assert (read_pruned(spark, path, keep).filter(pred).count()
            == ev.filter(pred).count())


def test_catalog_overwrite_layouts(spark, tmp_path):
    """Catalog.overwrite(cluster_by=/zorder_by=) produce prunable
    layouts and refuse ambiguous combinations."""
    import pytest

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = _grid(spark, n=32)
    cat.overwrite(df, "g_sorted", cluster_by=["x"], files=8)
    cat.overwrite(df, "g_z", zorder_by=["x", "y"], files=8)
    for t in ("g_sorted", "g_z"):
        assert cat.read(t).count() == 32 * 32
        zm = collect_zonemap(spark, cat.path(t), ["x"])
        assert len(prune_files(zm, "x", 0, 3)) < 8
    with pytest.raises(ValueError, match="mutually exclusive"):
        cat.overwrite(df, "bad", cluster_by=["x"], zorder_by=["x", "y"])
