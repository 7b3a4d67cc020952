"""Predicate helpers.

``interval_overlaps`` expands SQL ``(a_begin, a_end) OVERLAPS (b_begin,
b_end)`` — used by the reference for station snapshot windows
(``run/createIngestApsVizStationData.py:43-44``) — into Spark comparisons.
Spark has no OVERLAPS; the half-open ANSI semantics are
``a_begin < b_end AND b_begin < a_end`` (point intervals handled by
equality fallback).
"""

from __future__ import annotations

from pyspark.sql import Column


def interval_overlaps(a_begin: Column, a_end: Column, b_begin: Column, b_end: Column,
                      *, inclusive: bool = True) -> Column:
    """Interval overlap predicate.

    ``inclusive=True`` treats interval ends as closed (``[b, e]``) — the
    behavior the reference relies on for whole-day date windows;
    ``inclusive=False`` gives exact ANSI OVERLAPS (half-open).
    """
    if inclusive:
        return (a_begin <= b_end) & (b_begin <= a_end)
    return (a_begin < b_end) & (b_begin < a_end)
