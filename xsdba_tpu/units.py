"""Alias module mirroring the reference's ``xsdba.units`` import path."""

from .utils.units import (  # noqa: F401
    Quantity,
    Unit,
    convert_units_to,
    harmonize_units,
    infer_sampling_units,
    parse_units,
    pint_multiply,
    str2pint,
    str2quantity,
    units2pint,
    units2str,
)
