from .bootstrap import bootstrap  # noqa: F401
from .obs_ingest import ObsIngest  # noqa: F401
from .read_api import (  # noqa: F401
    get_forecast_timeseries_station_data,
    get_nowcast_timeseries_station_data,
    get_obs_timeseries_station_data,
    get_obs_timeseries_station_data_allparms,
    to_json_array,
)
