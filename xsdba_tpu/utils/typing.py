"""Public typing helpers (reference ``typing.py``)."""

from __future__ import annotations

from enum import IntEnum
from typing import Union

from .container import DataArray
from .units import Quantity

__all__ = ["InputKind", "Quantified"]

#: A physical quantity: a DataArray, a "1 mm d-1"-style string, or a Quantity.
Quantified = Union[DataArray, str, Quantity]


class InputKind(IntEnum):
    """Constants for descriptions of the nature of inputs
    (reference typing.py:26-117)."""

    VARIABLE = 0
    OPTIONAL_VARIABLE = 1
    QUANTIFIED = 2
    FREQ_STR = 3
    NUMBER = 4
    STRING = 5
    DAY_OF_YEAR = 6
    DATE = 7
    NUMBER_SEQUENCE = 8
    BOOL = 9
    DICT = 10
    KWARGS = 50
    DATASET = 70
    OTHER_PARAMETER = 99
