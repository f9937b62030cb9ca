"""Alias module mirroring the reference's ``xsdba.base`` import path."""

from .processing import stack_periods, unstack_periods  # noqa: F401
from .utils import get_op  # noqa: F401
from .utils.calendar import (  # noqa: F401
    MAX_DOY as max_doy,
    compare_offsets,
    construct_offset,
    interpolate_doy_calendar,
    parse_offset,
)
from .utils.grouper import Grouper, parse_group  # noqa: F401
from .utils.params import Parametrizable, ParametrizableWithDataset  # noqa: F401
