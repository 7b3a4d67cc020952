"""Write-side clustering: lay data out so zone maps can skip files.

Zone maps (``sources/zonemap.py``) only pay off when files cover
NARROW value ranges — a randomly-laid-out corpus has every file
spanning the full domain and nothing prunes. These helpers are the
write-time half of data skipping:

- :func:`cluster_write` — range-shard + sort on one key set. Perfect
  skipping on the leading key, none on the others (a total order can
  only favor one dimension).
- :func:`zorder_write` — interleave the bits of SEVERAL columns into
  one Morton (Z-order) key and range-shard on that. Each file then
  covers a small hyper-rectangle of the joint domain, so single-column
  predicates on ANY of the keys prune well (the Delta `OPTIMIZE
  ZORDER BY` shape; Morton 1966, public). The z-value is a pure
  map-side expression — one stats agg for min/max normalization, one
  range shuffle, no UDFs.

Both write sorted-within-file output, which also aligns parquet
row-group stats for Spark's own pushed-filter row-group skipping.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key; 2 dims x 16 bits = 32-bit
#: z-values — 4 billion cells, far below collision concern for file
#: counts, and the interleave expression stays small in codegen
ZORDER_BITS = 16


def cluster_write(df: DataFrame, path: str, by: Sequence[str], *,
                  files: int = 32, mode: str = "overwrite") -> None:
    """Range-shard ``df`` into ``files`` files ordered by ``by`` — each
    output file covers one narrow slice of the leading key's domain
    (ideal zone-map selectivity on it)."""
    (df.repartitionByRange(files, *[F.col(c) for c in by])
     .sortWithinPartitions(*by)
     .write.mode(mode).parquet(path))


def _normalized(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a NUMERIC ``col`` onto the integer grid [0, 2^bits):
    rank-free min/max scaling — monotone, so range predicates on the
    source column map to range predicates on the grid cell. Degenerate
    (lo == hi) columns collapse to cell 0."""
    span = hi - lo
    frac = (col - F.lit(lo)) / F.lit(span) if span > 0 else F.lit(0.0)
    cell = F.floor(frac * F.lit(float(1 << bits)))
    return F.least(F.greatest(cell, F.lit(0)),
                   F.lit((1 << bits) - 1)).cast("long")


def _numeric_form(df: DataFrame, c: str):
    """(numeric column expr, driver-value → float) for a z-order
    dimension. Temporal columns go through TIMESTAMP_NTZ epoch
    arithmetic (the repo's timezone-free convention — never a
    tz-sensitive double cast); tz-aware timestamps are refused loudly
    (cast them to TIMESTAMP_NTZ at a declared zone first)."""
    import datetime as _dt

    dtype = dict(df.dtypes)[c]
    if dtype == "timestamp_ntz":
        return (F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                       f"'1970-01-01 00:00:00', `{c}`)").cast("double"),
                lambda v: (v - _dt.datetime(1970, 1, 1)).total_seconds()
                * 1e6)
    if dtype == "timestamp":
        raise ValueError(
            f"z-order column '{c}' is a tz-aware timestamp — cast it to "
            "TIMESTAMP_NTZ at a declared zone first (epoch arithmetic on "
            "tz-aware values is session-timezone-sensitive)")
    if dtype == "date":
        return (F.datediff(F.col(c), F.lit("1970-01-01")).cast("double"),
                lambda v: float((v - _dt.date(1970, 1, 1)).days))
    return F.col(c).cast("double"), float


def zorder_key(df: DataFrame, by: Sequence[str], *,
               bits: int = ZORDER_BITS) -> Column:
    """The Morton interleave of ``by`` (numeric/timestamp columns) as a
    map-side expression: bit j of dimension d lands at position
    ``j * len(by) + d``. Min/max for the normalization come from ONE
    small agg job (two scalars per column — driver literals thereafter,
    the k-means/centroid idiom used elsewhere in this repo)."""
    stats = df.agg(*[f(c).alias(f"{f.__name__}_{c}")
                     for c in by for f in (F.min, F.max)]).collect()[0]
    z = F.lit(0).cast("long")
    for d, c in enumerate(by):
        ncol, to_num = _numeric_form(df, c)
        cell = _normalized(ncol, to_num(stats[f"min_{c}"]),
                           to_num(stats[f"max_{c}"]), bits)
        # spread each bit of the cell to its interleaved position
        for j in range(bits):
            z = z + F.shiftleft(F.shiftright(cell, j) % 2,
                                j * len(by) + d)
    return z


def zorder_write(df: DataFrame, path: str, by: Sequence[str], *,
                 files: int = 32, bits: int = ZORDER_BITS,
                 mode: str = "overwrite") -> None:
    """Z-order-cluster ``df`` into ``files`` files: range-shard on the
    Morton key so every file covers a compact hyper-rectangle of the
    joint ``by`` domain — zone maps then prune on ANY of the columns,
    not just a sort leader. The key is dropped from the output."""
    z = zorder_key(df, by, bits=bits)
    (df.withColumn("__z", z)
     .repartitionByRange(files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))
