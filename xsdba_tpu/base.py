"""Alias module mirroring the reference's ``xsdba.base`` import path.

Beyond re-exports, this module carries eager equivalents of the reference's
dask-graph helpers (``map_blocks``/``map_groups``/``uses_dask``/
``ensure_chunk_size``, reference base.py:541-860): under jit there are no
lazy blocks — arrays are resident device buffers and grouping is lowered to
static indexes — so the single-block (eager) semantics of each helper IS the
whole contract here.
"""

from __future__ import annotations

import functools

import numpy as np

from .processing import stack_periods, unstack_periods  # noqa: F401
from .utils import get_op  # noqa: F401
from .utils.calendar import (  # noqa: F401
    MAX_DOY as max_doy,
    compare_offsets,
    construct_offset,
    interpolate_doy_calendar,
    parse_offset,
)
from .utils.container import DataArray
from .utils.grouper import Grouper, parse_group  # noqa: F401
from .utils.params import Parametrizable, ParametrizableWithDataset  # noqa: F401

#: Calendars with a fixed year length (reference base.py:1048).
uniform_calendars = ("noleap", "all_leap", "365_day", "366_day", "360_day")


def uses_dask(*das) -> bool:
    """Whether any input wraps a dask array (reference base.py:834-846).

    This framework holds data as resident numpy/JAX buffers — never dask —
    so this always returns False; provided so reference-portable user code
    branching on it takes the eager path."""
    return False


def ensure_chunk_size(da, **minchunks):
    """Identity here (reference base.py:782-831 rechunks dask blocks):
    device arrays have no chunk structure to repair."""
    return da


def duck_empty(dims, sizes, dtype="float64", chunks=None) -> DataArray:
    """An empty DataArray of the given dims/sizes (reference base.py:541-560;
    the ``chunks`` argument is accepted and ignored — no dask here)."""
    shape = tuple(int(sizes[d]) for d in dims)
    return DataArray(np.empty(shape, dtype=dtype), tuple(dims), {}, {}, None)


def map_blocks(reduces=None, **out_vars):
    """Decorator marking a function as block-mappable (reference
    base.py:563-726).  The reference builds a dask output template and maps
    the function over chunks; with resident arrays the whole input is one
    block, so the wrapper simply calls ``func`` — the declared ``reduces`` /
    ``out_vars`` dimension bookkeeping is metadata only.
    """

    def _decorator(func):
        @functools.wraps(func)
        def _wrapped(ds, **kwargs):
            return func(ds, **kwargs)

        _wrapped.__mapped__ = True
        _wrapped.__reduces__ = reduces
        _wrapped.__out_vars__ = out_vars
        return _wrapped

    return _decorator


def map_groups(reduces=None, main_only: bool = False, **out_vars):
    """Decorator for functions acting on one group's samples (reference
    base.py:729-779).  The decorated function has the reference signature
    ``func(da, *, dim, **kwargs)`` where ``dim`` names the stacked sample
    dimension; the wrapper is called with ``wrapped(da, group=Grouper(...),
    **kwargs)`` and runs the function over every group at once: samples are
    gathered along a trailing ``dim`` axis (window members included, NaN
    padded) and ``func`` reduces it.  Works with the DataArray reduction
    methods (``mean``/``std``/...); the result carries the group coordinate.
    """

    def _decorator(func):
        @functools.wraps(func)
        def _wrapped(da, *, group, **kwargs):
            if isinstance(group, str):
                group = Grouper(group)
            member_dim = "stacked_sample"

            def _on_gathered(v):
                # v: [..., G, L] — batch dims, padded group, gathered members
                nb = v.ndim - 2
                dims = tuple(f"dim_{i}" for i in range(nb)) + (group.prop_name, member_dim)
                out = func(DataArray(v, dims, {}, {}, None), dim=member_dim, **kwargs)
                return out.data if isinstance(out, DataArray) else out

            return group.apply(_on_gathered, da, main_only=main_only)

        _wrapped.__mapped__ = True
        _wrapped.__reduces__ = reduces
        _wrapped.__out_vars__ = out_vars
        return _wrapped

    return _decorator
