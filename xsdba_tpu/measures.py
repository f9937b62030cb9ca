"""Statistical measures — difference metrics between a simulated property and
its reference counterpart (reference ``measures.py``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils.container import DataArray
from .utils.units import harmonize_units

__all__ = [
    "annual_cycle_correlation",
    "bias",
    "circular_bias",
    "mae",
    "ratio",
    "relative_bias",
    "rmse",
    "scorr",
    "taylordiagram",
]


def _pair(sim: DataArray, ref: DataArray):
    (sim, ref), _ = harmonize_units(sim, ref)
    return jnp.asarray(sim.data), jnp.asarray(ref.data), sim


def _wrap(sim: DataArray, vals, name, units):
    out = DataArray(vals, sim.dims, dict(sim.coords), {"units": units}, name)
    out.attrs["long_name"] = name
    return out


def bias(sim: DataArray, ref: DataArray) -> DataArray:
    """sim - ref (reference measures.py:138-160)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, s - r, "bias", sim.units)


def relative_bias(sim: DataArray, ref: DataArray) -> DataArray:
    """(sim - ref)/ref (reference measures.py:163-186)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, (s - r) / r, "relative_bias", "")


def circular_bias(sim: DataArray, ref: DataArray) -> DataArray:
    """Day-of-year bias on the circle (reference measures.py:189-215):
    smallest signed distance mod 365."""
    s, r, sim = _pair(sim, ref)
    d = (s - r) % 365
    out = jnp.where(d > 365 / 2, d - 365, d)
    return _wrap(sim, out, "circular_bias", "d")


def ratio(sim: DataArray, ref: DataArray) -> DataArray:
    """sim / ref (reference measures.py:218-240)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, s / r, "ratio", "")


def rmse(sim: DataArray, ref: DataArray, dim: str = "time") -> DataArray:
    """Root mean square error along dim (reference measures.py:243-287)."""
    (sim, ref), _ = harmonize_units(sim, ref)
    sc = sim.move_dim_last(dim)
    rc = ref.move_dim_last(dim)
    out = jnp.sqrt(jnp.nanmean((jnp.asarray(sc.data) - jnp.asarray(rc.data)) ** 2, axis=-1))
    bdims = sc.dims[:-1]
    bcoords = {d: sc.coords[d] for d in bdims if d in sc.coords}
    return DataArray(out, bdims, bcoords, {"units": sim.units, "long_name": "rmse"}, "rmse")


def mae(sim: DataArray, ref: DataArray, dim: str = "time") -> DataArray:
    """Mean absolute error along dim (reference measures.py:290-332)."""
    (sim, ref), _ = harmonize_units(sim, ref)
    sc = sim.move_dim_last(dim)
    rc = ref.move_dim_last(dim)
    out = jnp.nanmean(jnp.abs(jnp.asarray(sc.data) - jnp.asarray(rc.data)), axis=-1)
    bdims = sc.dims[:-1]
    bcoords = {d: sc.coords[d] for d in bdims if d in sc.coords}
    return DataArray(out, bdims, bcoords, {"units": sim.units, "long_name": "mae"}, "mae")


def _nan_pearson(a, b, axis=-1):
    m = ~jnp.isnan(a) & ~jnp.isnan(b)
    n = jnp.sum(m, axis=axis, keepdims=True)
    a0 = jnp.where(m, a, 0.0)
    b0 = jnp.where(m, b, 0.0)
    ma = jnp.sum(a0, axis=axis, keepdims=True) / jnp.maximum(n, 1)
    mb = jnp.sum(b0, axis=axis, keepdims=True) / jnp.maximum(n, 1)
    ac = jnp.where(m, a - ma, 0.0)
    bc = jnp.where(m, b - mb, 0.0)
    return jnp.sum(ac * bc, axis=axis) / jnp.sqrt(jnp.sum(ac * ac, axis=axis) * jnp.sum(bc * bc, axis=axis))


def annual_cycle_correlation(sim: DataArray, ref: DataArray, window: int = 15) -> DataArray:
    """Pearson correlation of the smoothed day-of-year climatologies
    (reference measures.py:335-380)."""
    from .properties import _doy_climatology

    (sim, ref), _ = harmonize_units(sim, ref)
    clim_s, sc = _doy_climatology(sim, window)
    clim_r, _ = _doy_climatology(ref, window)
    out = _nan_pearson(clim_s, clim_r, axis=-1)
    bdims = sc.dims[:-1]
    bcoords = {d: sc.coords[d] for d in bdims if d in sc.coords}
    return DataArray(out, bdims, bcoords, {"units": "", "long_name": "annual_cycle_correlation"}, "annual_cycle_correlation")


def scorr(sim: DataArray, ref: DataArray, dims=None) -> DataArray:
    """Sum of inter-site correlations difference... measured as the relative
    difference of summed spatial correlation matrices (reference
    measures.py:383-422)."""
    from .properties import _pairwise_spearman

    sc = sim.move_dim_last("time")
    rc = ref.move_dim_last("time")
    s = jnp.asarray(sc.data).reshape(-1, sc.shape[-1])
    r = jnp.asarray(rc.data).reshape(-1, rc.shape[-1])
    corr_s = jnp.nansum(_pairwise_spearman(s))
    corr_r = jnp.nansum(_pairwise_spearman(r))
    return DataArray(jnp.asarray(corr_s / corr_r), (), {}, {"units": "", "long_name": "scorr"}, "scorr")


def taylordiagram(sim: DataArray, ref: DataArray, dim: str = "time", normalize: bool = False) -> DataArray:
    """Taylor-diagram triplet (ref std, sim std, correlation) along dim
    (reference measures.py:425-494)."""
    (sim, ref), _ = harmonize_units(sim, ref)
    sc = sim.move_dim_last(dim)
    rc = ref.move_dim_last(dim)
    s = jnp.asarray(sc.data)
    r = jnp.asarray(rc.data)
    sim_std = jnp.nanstd(s, axis=-1)
    ref_std = jnp.nanstd(r, axis=-1)
    corr = _nan_pearson(s, r, axis=-1)
    if normalize:
        sim_std = sim_std / ref_std
        ref_std = jnp.ones_like(ref_std)
    out = jnp.stack([ref_std, sim_std, corr], axis=0)
    bdims = sc.dims[:-1]
    bcoords = {d: sc.coords[d] for d in bdims if d in sc.coords}
    coords = {"taylor_param": np.array(["ref_std", "sim_std", "corr"]), **bcoords}
    return DataArray(out, ("taylor_param",) + bdims, coords, {"units": "" if normalize else sim.units, "long_name": "taylordiagram"}, "taylordiagram")
