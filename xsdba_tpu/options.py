"""Alias module mirroring the reference's ``xsdba.options`` import path."""

from .utils.options import (  # noqa: F401
    AS_DATASET,
    EXTRA_OUTPUT,
    OPTIONS,
    get_option,
    set_options,
)
