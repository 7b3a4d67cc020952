"""One-call facade over the file-skipping indexes for Catalog tables.

`zonemap.py` and `bloomskip.py` are the mechanisms; this module is the
usage contract: build both stats tables for a Catalog table in one
call, then issue predicate reads that (a) consult the right index,
(b) pass the CURRENT table path so staleness degrades safely in both
directions (post-build files kept, compaction-deleted rows dropped),
and (c) ALWAYS apply the real predicate on the pruned scan — skipping
is an I/O optimization the caller cannot get wrong, and a missing
stats table silently falls back to the plain filtered read.

Stats tables are named ``{table}__zm`` / ``{table}__bloom`` (double
underscore: the repo's reserved-sidecar convention, like the commit
ledgers)."""

from __future__ import annotations

import os
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloomskip import build_bloom_skip, prune_files_bloom
from .zonemap import build_zonemap, prune_files, read_pruned


def zm_table(table: str) -> str:
    return f"{table}__zm"


def bloom_table(table: str) -> str:
    return f"{table}__bloom"


def build_skipping(catalog, table: str, *,
                   range_cols: Iterable[str] = (),
                   equality_cols: Iterable[str] = (),
                   incremental: bool = False,
                   **bloom_kw) -> dict[str, int]:
    """Build the zone map over ``range_cols`` and the Bloom index over
    ``equality_cols`` for a Catalog table (either may be empty).
    Returns ``{stats_table: files_covered}``. ``incremental=True``
    refreshes without rescanning covered files (stats passes over new
    files only, dead rows retired). Once built, the Catalog mutation
    verbs keep the sidecars current automatically via
    :func:`refresh_skipping`; reads stay CORRECT against stale stats
    either way (the pruners get the live path), they just skip less."""
    out: dict[str, int] = {}
    path = catalog.path(table)
    if list(range_cols):
        out[zm_table(table)] = build_zonemap(
            catalog, path, range_cols, table=zm_table(table),
            incremental=incremental)
    if list(equality_cols):
        out[bloom_table(table)] = build_bloom_skip(
            catalog, path, equality_cols, table=bloom_table(table),
            incremental=incremental, **bloom_kw)
    return out


def skipping_spec(catalog, table: str) -> dict:
    """What the existing sidecars of ``table`` cover, recovered from the
    sidecars THEMSELVES (each stats row names its column; Bloom rows
    carry their geometry) — so maintenance hooks need no record of the
    original ``build_skipping`` arguments. Keys present only for
    sidecars that exist AND have rows: ``range_cols``,
    ``equality_cols``, ``n_bits``, ``n_hashes``. A zero-row sidecar
    (built while the table was empty) names no columns and cannot be
    refreshed — reads already degrade safely against it (uncovered
    files are kept), so it is simply skipped."""
    spec: dict = {}
    if catalog.exists(zm_table(table)):
        cols = sorted(r["column"] for r in catalog.read(zm_table(table))
                      .select("column").distinct().collect())
        if cols:
            spec["range_cols"] = cols
    if catalog.exists(bloom_table(table)):
        bl = catalog.read(bloom_table(table))
        cols = sorted(r["column"] for r in
                      bl.select("column").distinct().collect())
        if cols:
            spec["equality_cols"] = cols
            geom = (bl.filter("has_bloom")
                    .select("n_bits", "n_hashes").distinct().collect())
            if geom:
                spec["n_bits"] = geom[0]["n_bits"]
                spec["n_hashes"] = geom[0]["n_hashes"]
    return spec


def refresh_skipping(catalog, table: str) -> dict[str, int]:
    """Bring whatever skipping sidecars exist for ``table`` exactly
    current with the table's on-disk files — the maintenance hook
    :class:`~.catalog.Catalog` mutation verbs call automatically, so
    index staleness (previously SAFE but silent: reads just skipped
    less until someone re-ran ``build_skipping``) no longer
    accumulates. Incremental by construction: appends pay a stats pass
    over the new files only; compaction/overwrite replaced every file,
    so the incremental build degenerates to the full rebuild those
    need. No-op (two dir checks, zero Spark jobs) when the table has
    no sidecars — which is every table that never opted into skipping."""
    spec = skipping_spec(catalog, table)
    if not spec:
        return {}
    bloom_kw = {k: spec[k] for k in ("n_bits", "n_hashes") if k in spec}
    return build_skipping(catalog, table,
                          range_cols=spec.get("range_cols", ()),
                          equality_cols=spec.get("equality_cols", ()),
                          incremental=True, **bloom_kw)


def read_between(catalog, table: str, column: str, lo, hi) -> DataFrame:
    """``SELECT * FROM table WHERE column BETWEEN lo AND hi`` with
    zone-map file skipping when ``{table}__zm`` exists (plain filtered
    read otherwise). The real predicate is always applied — results
    are identical with or without the index."""
    path = catalog.path(table)
    pred = F.col(column).between(F.lit(lo), F.lit(hi))
    if not catalog.exists(zm_table(table)):
        return catalog.read(table).filter(pred)
    keep = prune_files(catalog.read(zm_table(table)), column, lo, hi,
                       path=path)
    return read_pruned(catalog.spark, path, keep).filter(pred)


def read_equals(catalog, table: str, column: str,
                values: Sequence) -> DataFrame:
    """``SELECT * FROM table WHERE column IN (values)`` with Bloom
    file skipping when ``{table}__bloom`` exists (plain filtered read
    otherwise). The real predicate is always applied."""
    path = catalog.path(table)
    vals = list(values)
    pred = F.col(column).isin(vals)
    if not catalog.exists(bloom_table(table)):
        return catalog.read(table).filter(pred)
    keep = prune_files_bloom(catalog.read(bloom_table(table)), column,
                             vals, path=path)
    return read_pruned(catalog.spark, path, keep).filter(pred)
