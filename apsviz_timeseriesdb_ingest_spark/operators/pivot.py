"""Crosstab pivots (SURVEY.md section 2.5 X1-X6).

The reference's read path is Postgres ``crosstab`` with a *fixed* category
list (``scripts/get_obs_timeseries_station_data.sql:26-38``). In Spark we
always pass explicit pivot values: with values supplied, ``pivot`` skips
the extra distinct-values job AND constant-folds the output schema — the
same optimization the reference gets from its hardcoded category list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.strings import sanitize_pivot_label


def crosstab_timeseries(df: DataFrame, *, row_key: str, pivot_col: str,
                        categories: Sequence[str], value: Column,
                        sanitize_labels: bool = True) -> DataFrame:
    """time × category matrix: one row per ``row_key``, one column per
    category, cell = ``first(value)`` (crosstab semantics: at most one
    underlying row per cell after upstream dedup).
    """
    out = (
        df.groupBy(row_key)
        .pivot(pivot_col, list(categories))
        .agg(F.first(value, ignorenulls=True))
    )
    if sanitize_labels:
        renames = {c: sanitize_pivot_label(c) for c in categories if sanitize_pivot_label(c) != c}
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
    return out.orderBy(row_key)


def kv_pivot(df: DataFrame, *, group_key: str, key_col: str, value_col: str,
             keys: Sequence[str]) -> DataFrame:
    """Key/value rows → one wide row per group (SURVEY X5: the
    ``config_item`` run-property pivot,
    ``scripts/get_adcirc_run_property_variables.sql:11-50``)."""
    return (
        df.groupBy(group_key)
        .pivot(key_col, list(keys))
        .agg(F.first(value_col, ignorenulls=True))
    )
