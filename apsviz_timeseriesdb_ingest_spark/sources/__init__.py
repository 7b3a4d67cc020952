from .catalog import Catalog  # noqa: F401
from .harvest_csv import read_harvest_csv, read_station_csv  # noqa: F401
