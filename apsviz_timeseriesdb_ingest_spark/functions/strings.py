"""String helpers (SURVEY.md section 2.7 F6/F9, section 2.5 X6)."""

from __future__ import annotations


def sanitize_pivot_label(label: str) -> str:
    """Strip dots from a dynamic pivot column label.

    Mirrors ``SPLIT_PART(data_source,'.',1) || SPLIT_PART(data_source,'.',2)``
    (``scripts/get_forecast_timeseries_station_data.sql:32``) generalized to
    any number of dots.
    """
    return label.replace(".", "")


def csv_url(base: str, **params: str) -> str:
    """Build the csvurl the reference attaches to apsviz stations
    (``run/createIngestApsVizStationData.py:317-319``)."""
    query = "&".join(f"{k}={v}" for k, v in params.items())
    return f"{base}?{query}" if query else base
