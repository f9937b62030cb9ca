from .calendar import TimeIndex, date_range, max_doy
from .container import DataArray, Dataset
from .grouper import GroupIndexes, Grouper, parse_group
from .options import get_option, set_options
