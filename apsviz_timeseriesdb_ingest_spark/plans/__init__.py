from .apsviz_stations import (  # noqa: F401
    ingest_retain_obs_station,
    publish_apsviz_stations,
)
from .bootstrap import bootstrap  # noqa: F401
from .dashboard_meta import get_adcirc_run_property_variables  # noqa: F401
from .model_ingest import ModelIngest  # noqa: F401
from .obs_ingest import ObsIngest  # noqa: F401
from .read_api import (  # noqa: F401
    get_forecast_timeseries_station_data,
    get_nowcast_timeseries_station_data,
    get_obs_timeseries_station_data,
    get_obs_timeseries_station_data_allparms,
    to_json_array,
)
