from .calendar import TimeIndex, date_range, max_doy
from .container import DataArray, Dataset
from .grouper import GroupIndexes, Grouper, parse_group, period_blocks
from .options import get_option, set_options
from .units import Quantity, convert_units_to, harmonize_units, infer_sampling_units, str2quantity, units2str

import operator as _op

#: Comparison-operator lookup — reference base.py:859-890.
OPERATORS = {
    ">": _op.gt, "gt": _op.gt, "<": _op.lt, "lt": _op.lt,
    ">=": _op.ge, "ge": _op.ge, "<=": _op.le, "le": _op.le,
    "==": _op.eq, "eq": _op.eq, "!=": _op.ne, "ne": _op.ne,
}


def get_op(op: str):
    """Return the comparison function for an operator string
    (reference base.py:859-890)."""
    try:
        return OPERATORS[op]
    except KeyError as err:
        raise ValueError(f"Operation `{op}` not recognized.") from err
