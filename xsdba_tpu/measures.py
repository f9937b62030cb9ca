"""Statistical measures — difference metrics between a simulated property and
its reference counterpart (reference ``measures.py``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils.container import DataArray
from .utils.units import harmonize_units

__all__ = [
    "StatisticalMeasure",
    "StatisticalPropertyMeasure",
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


class StatisticalMeasure:
    """Base class for measures comparing ``sim`` against ``ref`` (reference
    ``measures.py:26-62``): validates that both inputs are DataArrays with
    identical coordinates on common dimensions, converts ``sim`` to ``ref``'s
    units, then runs the compute function.
    """

    realm = "generic"

    def __init__(self, identifier: str, compute, units: str | None = None):
        self.identifier = identifier
        self._compute = compute
        self._units = units
        self.__doc__ = compute.__doc__

    def _preprocess_and_checks(self, sim: DataArray, ref: DataArray):
        if not isinstance(sim, DataArray) or not isinstance(ref, DataArray):
            raise TypeError(f"{self.identifier} requires DataArray 'sim' and 'ref' inputs.")
        from .utils.units import convert_units_to

        if sim.attrs.get("units", "") != ref.attrs.get("units", ""):
            sim = convert_units_to(sim, ref)
        for dim in set(sim.dims) & set(ref.dims):
            ls = sim.sizes[dim]
            lr = ref.sizes[dim]
            if ls != lr:
                raise ValueError(
                    f"Common dimension {dim} has different coordinates between ref and sim."
                )
            cs, cr = sim.coords.get(dim), ref.coords.get(dim)
            if cs is not None and cr is not None and not np.array_equal(np.asarray(cs), np.asarray(cr)):
                raise ValueError(
                    f"Common dimension {dim} has different coordinates between ref and sim."
                )
        return sim, ref

    def __call__(self, sim: DataArray, ref: DataArray, *args, **kwargs) -> DataArray:
        sim, ref = self._preprocess_and_checks(sim, ref)
        out = self._compute(sim, ref, *args, **kwargs)
        if self._units is not None:
            out.attrs["units"] = self._units
        out.attrs.setdefault("long_name", self.identifier)
        return out


class StatisticalPropertyMeasure(StatisticalMeasure):
    """Property+measure combination (reference ``measures.py:65-131``): adds
    the ``aspect`` attribute and ``allowed_groups`` validation of a ``group``
    keyword on top of the :class:`StatisticalMeasure` checks."""

    def __init__(self, identifier: str, compute, aspect: str, allowed_groups=None, units: str | None = None):
        super().__init__(identifier, compute, units)
        self.aspect = aspect
        self.allowed_groups = allowed_groups

    def __call__(self, sim: DataArray, ref: DataArray, *args, **kwargs) -> DataArray:
        from .utils.grouper import Grouper

        group = kwargs.pop("group", "time")
        group = Grouper(group) if isinstance(group, str) else group
        if self.allowed_groups is not None and group.prop not in self.allowed_groups:
            raise ValueError(
                f"Grouping period {group.prop_name} is not allowed for property "
                f"{self.identifier} (needs one of {self.allowed_groups})."
            )
        out = super().__call__(sim, ref, *args, **kwargs)
        out.attrs["aspect"] = self.aspect
        return out


def _pair(sim: DataArray, ref: DataArray):
    (sim, ref), _ = harmonize_units(sim, ref)
    return jnp.asarray(sim.data), jnp.asarray(ref.data), sim


def _wrap(sim: DataArray, vals, name, units):
    out = DataArray(vals, sim.dims, dict(sim.coords), {"units": units}, name)
    out.attrs["long_name"] = name
    return out


def _bias(sim: DataArray, ref: DataArray) -> DataArray:
    """sim - ref (reference measures.py:138-160)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, s - r, "bias", sim.units)


def _relative_bias(sim: DataArray, ref: DataArray) -> DataArray:
    """(sim - ref)/ref (reference measures.py:163-186)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, (s - r) / r, "relative_bias", "")


def _circular_bias(sim: DataArray, ref: DataArray) -> DataArray:
    """Day-of-year bias on the circle (reference measures.py:189-215).

    Exact reference formula: the magnitude is the minimal circular distance
    mod 365, but the SIGN comes from the linear comparison ``ref >= sim``
    (positive when ref is the linearly larger doy) — reproduced as-is,
    quirks included, for value parity."""
    s, r, sim = _pair(sim, ref)
    d = (s - r) % 365
    mag = jnp.where(d > 365 / 2, 365 - d, d)
    out = jnp.where(r >= s, mag, -mag)
    return _wrap(sim, out, "circular_bias", "d")


def _ratio(sim: DataArray, ref: DataArray) -> DataArray:
    """sim / ref (reference measures.py:218-240)."""
    s, r, sim = _pair(sim, ref)
    return _wrap(sim, s / r, "ratio", "")


def _rmse(sim: DataArray, ref: DataArray, dim: str = "time") -> DataArray:
    """Root mean square error along dim (reference measures.py:243-287)."""
    (sim, ref), _ = harmonize_units(sim, ref)
    sc = sim.move_dim_last(dim)
    rc = ref.move_dim_last(dim)
    out = jnp.sqrt(jnp.nanmean((jnp.asarray(sc.data) - jnp.asarray(rc.data)) ** 2, axis=-1))
    bdims = sc.dims[:-1]
    bcoords = {d: sc.coords[d] for d in bdims if d in sc.coords}
    return DataArray(out, bdims, bcoords, {"units": sim.units, "long_name": "rmse"}, "rmse")


def _mae(sim: DataArray, ref: DataArray, dim: str = "time") -> DataArray:
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


def _annual_cycle_correlation(sim: DataArray, ref: DataArray, window: int = 15) -> DataArray:
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


def _scorr(sim: DataArray, ref: DataArray, dims=None) -> DataArray:
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


def _taylordiagram(sim: DataArray, ref: DataArray, dim: str = "time", normalize: bool = False) -> DataArray:
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


# -- public instances (reference measures.py:161-494) ------------------------

bias = StatisticalMeasure("bias", _bias)
relative_bias = StatisticalMeasure("relative_bias", _relative_bias, units="")
circular_bias = StatisticalMeasure("circular_bias", _circular_bias, units="days")
ratio = StatisticalMeasure("ratio", _ratio, units="")
rmse = StatisticalPropertyMeasure("rmse", _rmse, aspect="temporal", allowed_groups=["group"])
mae = StatisticalPropertyMeasure("mae", _mae, aspect="temporal", allowed_groups=["group"])
annual_cycle_correlation = StatisticalPropertyMeasure(
    "annual_cycle_correlation", _annual_cycle_correlation, aspect="temporal", allowed_groups=["group"], units=""
)
scorr = StatisticalPropertyMeasure("Scorr", _scorr, aspect="spatial", allowed_groups=["group"], units="")
taylordiagram = StatisticalPropertyMeasure("taylordiagram", _taylordiagram, aspect="temporal", allowed_groups=["group"])
