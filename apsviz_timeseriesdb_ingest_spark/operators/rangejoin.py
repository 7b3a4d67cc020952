"""Interval-overlap JOIN via bucket expansion — the equi-join
formulation of ``[a_begin, a_end] OVERLAPS [b_begin, b_end]``.

A raw overlap join is a theta join: without equality keys Spark can only
BroadcastNestedLoopJoin it (O(|L|·|R|) comparisons, broadcast-bounded),
and even with keys every same-key pair is compared. The standard
scale-out: quantize time into fixed buckets, explode each interval into
the buckets it touches, equi-join on (keys…, bucket), then verify the
exact predicate and dedupe pairs that met in several buckets.

Cost model: shuffle size multiplies by ~(interval length / bucket size),
and per-bucket work is |L_bucket| × |R_bucket|. Pick the bucket near the
MEDIAN interval length: much smaller multiplies rows for nothing, much
larger degrades toward all-pairs within a bucket. The expansion factor
is the query's knob, not the engine's — same tradeoff as the reference's
36-hour station snapshot window scan
(``run/createIngestApsVizStationData.py:43-44``), which is the k=36h
special case of this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import interval_overlaps

_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
          "week": 604800}


def _bucket_seconds(bucket: str) -> int:
    """Parse '2 hours' / '1 day' / '30 minutes' into seconds."""
    parts = bucket.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"bucket must look like '1 hour', got {bucket!r}")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNITS:
        raise ValueError(f"unknown bucket unit {unit!r}")
    return int(n) * _UNITS[unit]


def _bucketed(df: DataFrame, begin: str, end: str, step: int) -> DataFrame:
    lo = (F.unix_timestamp(F.col(begin).cast("timestamp")) / step).cast("long")
    hi = (F.unix_timestamp(F.col(end).cast("timestamp")) / step).cast("long")
    return df.withColumn("__bkt", F.explode(F.sequence(lo, hi)))


def overlap_join(left: DataFrame, right: DataFrame, *,
                 left_begin: str, left_end: str,
                 right_begin: str, right_end: str,
                 left_id: str, right_id: str,
                 on: Sequence[str] = (),
                 bucket: str = "1 day",
                 inclusive: bool = True) -> DataFrame:
    """Overlap join returning every (left row ⋈ right row) pair whose
    intervals overlap (and whose ``on`` keys match, if given).

    ``left_id`` / ``right_id`` name unique row ids on each side — pairs
    that meet in several buckets are deduped on (left_id, right_id).
    Right-side columns that collide with left names get an ``_r`` suffix
    (ids and ``on`` keys keep their names).
    """
    if right_id in left.columns:
        raise ValueError(
            f"right_id {right_id!r} collides with a left column — alias one "
            "side before joining (the pair dedup needs both ids unambiguous)")
    step = _bucket_seconds(bucket)
    keys = list(on)
    l_b = _bucketed(left, left_begin, left_end, step)
    r_names = {}
    for c in right.columns:
        r_names[c] = c if (c == right_id or c in keys
                           or c not in left.columns) else f"{c}_r"
    r_renamed = right.select(*[F.col(c).alias(n) for c, n in r_names.items()])
    r_b = _bucketed(r_renamed, r_names[right_begin], r_names[right_end], step)
    pred = interval_overlaps(
        F.col(left_begin).cast("timestamp"),
        F.col(left_end).cast("timestamp"),
        F.col(r_names[right_begin]).cast("timestamp"),
        F.col(r_names[right_end]).cast("timestamp"),
        inclusive=inclusive)
    return (l_b.join(r_b, ["__bkt", *keys])
            .filter(pred)
            .drop("__bkt")
            .dropDuplicates([left_id, right_id]))
