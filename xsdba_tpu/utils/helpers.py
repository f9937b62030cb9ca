"""Small public utilities mirroring reference ``xsdba/utils.py`` helpers.

These are host-side conveniences (the hot paths live in ``ops/``): cyclic
padding, doy-range alignment, 1-D CDF mapping, tie-breaking noise, 1-D
cluster extraction, attribute copying.
"""

from __future__ import annotations

import warnings

import numpy as np

from .container import DataArray, Dataset

__all__ = [
    "add_cyclic_bounds",
    "copy_all_attrs",
    "ecdf",
    "ensure_longest_doy",
    "get_clusters_1d",
    "map_cdf",
    "map_cdf_1d",
    "rand_rot_matrix",
    "random_tiebreak",
]


def add_cyclic_bounds(da: DataArray, att: str, cyclic_coords: bool = True) -> DataArray:
    """Prepend the last slice and append the first along ``att`` so
    interpolation works near the end points (reference ``utils.py:284-314``).

    With ``cyclic_coords=False`` the new coordinate values extrapolate their
    neighbours' step instead of wrapping.
    """
    ax = da.get_axis_num(att)
    data = np.asarray(da.data)
    idx_first = [slice(None)] * data.ndim
    idx_last = list(idx_first)
    idx_first[ax] = slice(0, 1)
    idx_last[ax] = slice(-1, None)
    padded = np.concatenate([data[tuple(idx_last)], data, data[tuple(idx_first)]], axis=ax)
    coords = dict(da.coords)
    if att in coords:
        c = np.asarray(coords[att])
        if cyclic_coords:
            cc = np.concatenate([c[-1:], c, c[:1]])
        else:
            d0 = c[1] - c[0] if len(c) > 1 else 1
            d1 = c[-1] - c[-2] if len(c) > 1 else 1
            cc = np.concatenate([[c[0] - d0], c, [c[-1] + d1]])
        coords[att] = cc
    return DataArray(padded, da.dims, coords, dict(da.attrs), da.name)


def ensure_longest_doy(func):
    """Decorator: align two dayofyear-indexed arrays onto the longest doy
    range before calling ``func(x, y, ...)`` (reference ``utils.py:108-131``).
    """
    import functools

    from .calendar import interpolate_doy_calendar

    def _align(da: DataArray, mdoy: int, mn: int) -> DataArray:
        ax = da.get_axis_num("dayofyear")
        out = interpolate_doy_calendar(np.asarray(da.data), mdoy, mn, axis=ax)
        coords = dict(da.coords)
        coords["dayofyear"] = np.arange(mn, mdoy + 1)
        return DataArray(out, da.dims, coords, dict(da.attrs), da.name)

    @functools.wraps(func)
    def _wrapped(x, y, *args, **kwargs):
        if (
            hasattr(x, "dims")
            and hasattr(y, "dims")
            and "dayofyear" in getattr(x, "dims", ())
            and "dayofyear" in getattr(y, "dims", ())
        ):
            dx = np.asarray(x.coords["dayofyear"])
            dy = np.asarray(y.coords["dayofyear"])
            if dx.max() != dy.max():
                warnings.warn(
                    "get_correction received inputs defined on different dayofyear "
                    "ranges. Interpolating to the longest range. Results could be strange.",
                    stacklevel=4,
                )
                if dx.max() < dy.max():
                    x = _align(x, int(dy.max()), int(dy.min()))
                else:
                    y = _align(y, int(dx.max()), int(dx.min()))
        return func(x, y, *args, **kwargs)

    return _wrapped


def map_cdf_1d(x, y, y_value):
    """Value in ``x`` with the same empirical CDF as ``y_value`` in ``y``
    (reference ``utils.py:35-44``)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    sy = np.r_[-np.inf, np.sort(y, axis=None)]
    q = np.searchsorted(sy, y_value, side="right") / np.sum(~np.isnan(sy))
    return np.nanquantile(x, q=q)


def ecdf(x, value, dim: str = "time"):
    """P(X <= value) along ``dim`` (reference ``utils.py:87-105``).

    Accepts a container DataArray (named ``dim``) or a bare array (``dim``
    as an integer axis, default last)."""
    from ..ops import correction as _corr

    if isinstance(x, DataArray):
        xc = x.move_dim_last(dim)
        out = _corr.ecdf(xc.data, value, axis=-1)
        bdims = xc.dims[:-1]
        return DataArray(out, bdims, {d: xc.coords[d] for d in bdims if d in xc.coords}, {"units": ""}, x.name)
    return _corr.ecdf(x, value, axis=dim if isinstance(dim, int) else -1)


def map_cdf(ds, *, y_value, dim: str = "time"):
    """Value in ``ds.x`` with the same CDF as ``y_value`` in ``ds.y``
    (reference ``utils.py:47-84``): quantile mapping of a scalar threshold.

    ``ds`` is a Dataset with variables ``x`` (values to pick from) and ``y``
    (values ranking ``y_value``); vectorizes over all non-``dim`` dims."""
    from ..ops import correction as _corr

    x, y = ds["x"], ds["y"]
    xc = x.move_dim_last(dim)
    yc = y.move_dim_last(dim)
    yv = np.atleast_1d(y_value).astype(float)
    outs = [np.asarray(_corr.map_cdf(xc.data, yc.data, np.asarray(v), axis=-1)) for v in yv]
    out = np.stack(outs, axis=-1)  # [..., len(y_value)] — reference's "x" dim
    bdims = xc.dims[:-1]
    coords = {d: xc.coords[d] for d in bdims if d in xc.coords}
    return DataArray(out, bdims + ("x",), coords, dict(x.attrs), x.name)


def rand_rot_matrix(crd, num: int = 1, new_dim: str | None = None, **kwargs):
    """Random SO(N) rotation matrices (reference ``utils.py:924-975``,
    Mezzadri 2007).

    With an integer first argument this is the device kernel
    (:func:`xsdba_tpu.ops.rotation.rand_rot_matrix`, extra kwargs pass
    through).  With a coordinate DataArray it returns a labelled DataArray
    over ``(crd_dim, new_dim)`` — stacked along ``matrices`` when num > 1 —
    matching the reference's form."""
    from ..ops.rotation import rand_rot_matrix as _device

    if isinstance(crd, (int, np.integer)):
        return _device(int(crd), num=num, **kwargs)
    vals = np.asarray(crd.data if isinstance(crd, DataArray) else crd)
    dim = crd.dims[0] if isinstance(crd, DataArray) else "crd"
    if new_dim is None:
        new_dim = dim + "_prime"
    N = vals.size
    mats = np.asarray(_device(N, num=num, **kwargs), dtype=np.float32)  # [num?, N, N]
    coords = {dim: vals, new_dim: vals.copy()}
    attrs = {"crd_dim": dim, "new_dim": new_dim}
    if num > 1:
        return DataArray(mats, ("matrices", dim, new_dim), coords, attrs, "rot_matrices")
    return DataArray(mats, (dim, new_dim), coords, attrs, "rot_matrix")


def random_tiebreak(da: DataArray, dim: str = "time") -> DataArray:
    """Add noise scaled to the smallest nonzero difference along ``dim``,
    breaking ties without reordering non-tied values (reference
    ``utils.py:543-571``)."""
    import jax

    from ..processing import next_key

    dac = da.move_dim_last(dim)
    x = np.asarray(dac.data, dtype=float)
    s = np.sort(x, axis=-1)
    d = np.diff(s, axis=-1)
    d = np.where(d > 0, d, np.nan)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        min_diff = np.nanmin(d)
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    noise = np.asarray(
        jax.random.uniform(
            next_key(), x.shape, dtype=dt, minval=0.1 * min_diff, maxval=0.25 * min_diff
        )
    ).astype(x.dtype)
    out = DataArray(x + noise, dac.dims, dict(dac.coords), dict(da.attrs), da.name)
    return out.transpose(*da.dims) if out.dims != da.dims else out


def get_clusters_1d(data: np.ndarray, u1: float, u2: float):
    """Clusters of a 1-D array: maximal runs above ``u2`` containing at least
    one value above ``u1`` (reference ``utils.py:788-840``; Extremes.jl
    ``getcluster``).  Returns ``(starts, ends, maxpos, maxval)`` with ``ends``
    inclusive.

    Host form of the device kernel (:mod:`xsdba_tpu.ops.clusters`): run
    membership -> segment reductions over run spans (``ufunc.reduceat``), no
    per-run Python loop.  A NaN is never a member, so it terminates a run.
    """
    x = np.asarray(data)
    member = x > u2  # NaN compares False -> breaks runs
    if not member.any():
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy(), np.array([])
    member_prev = np.concatenate(([False], member[:-1]))
    member_next = np.concatenate((member[1:], [False]))
    first = np.flatnonzero(member & ~member_prev)  # run begins
    last = np.flatnonzero(member & ~member_next)  # run ends (inclusive)
    filled = np.where(member, x, -np.inf)
    run_max = np.maximum.reduceat(filled, first)
    # segment argmax = earliest member position attaining the run maximum
    run_of = np.cumsum(member & ~member_prev) - 1
    at_max = member & (filled == run_max[run_of])
    positions = np.where(at_max, np.arange(x.size), x.size)
    run_maxpos = np.minimum.reduceat(positions, first)
    keep = run_max > u1
    return first[keep], last[keep], run_maxpos[keep], run_max[keep]


def copy_all_attrs(ds, ref):
    """Copy attributes of ``ref`` onto ``ds``, including shared coordinates'
    and variables' attrs (reference ``utils.py:1151-1159``)."""
    ds.attrs.update(ref.attrs)
    if isinstance(ds, Dataset) and isinstance(ref, Dataset):
        for name, var in ds.items():
            if name in ref:
                var.attrs.update(ref[name].attrs)
