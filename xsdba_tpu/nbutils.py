"""Alias module mirroring the reference's ``xsdba.nbutils`` import path.

The reference's numba kernels (nbutils.py) map to device-native ops here:
type-7 NaN-quantiles and vectorized quantiles are ``ops.quantile`` (sort +
virtual-index lerp, no per-row loops), the escore factorization is
``ops.escore``, extrapolation helpers are ``ops.interp``.  This module keeps
the reference's public call forms for portable user code.
"""

from __future__ import annotations

import numpy as np

from .utils.container import DataArray

__all__ = ["quantile", "remove_NaNs", "vecquantiles"]


def _axis_of(da, dim):
    dims = (dim,) if isinstance(dim, str) else tuple(dim)
    return tuple(da.dims.index(d) for d in dims)


def remove_NaNs(x):  # noqa: N802 - reference name (nbutils.py:283-288)
    """Drop samples (columns of a [variables, time] array) where ANY
    variable is NaN."""
    x = np.asarray(x)
    keep = ~np.isnan(x).any(axis=0)
    return x[:, keep]


def quantile(da, q, dim):
    """Type-7 NaN-quantiles of ``da`` along ``dim`` (reference
    nbutils.py:224-280).  Accepts a DataArray (returns one, with a
    ``quantiles`` dimension) or a bare array with ``dim`` as axis index."""
    import jax.numpy as jnp

    from .ops.quantile import nan_quantile

    q = np.atleast_1d(np.asarray(q, dtype=np.float64))
    if isinstance(da, DataArray):
        axes = _axis_of(da, dim)
        x = jnp.asarray(da.data)
        if len(axes) > 1:  # flatten the reduced dims into one trailing axis
            keep = [i for i in range(x.ndim) if i not in axes]
            x = jnp.transpose(x, keep + list(axes)).reshape(
                tuple(x.shape[i] for i in keep) + (-1,)
            )
            out = nan_quantile(x, jnp.asarray(q, x.dtype), axis=-1)
        else:
            out = nan_quantile(x, jnp.asarray(q, x.dtype), axis=axes[0])
        dims = tuple(d for d in da.dims if d not in ((dim,) if isinstance(dim, str) else tuple(dim)))
        coords = {d: c for d, c in da.coords.items() if d in dims}
        coords["quantiles"] = q
        return DataArray(out, dims + ("quantiles",), coords, dict(da.attrs), da.name)
    if not isinstance(dim, int):
        raise TypeError(
            f"quantile on a bare array needs an integer axis, got dim={dim!r} "
            "(wrap the array in a DataArray to reduce by dimension name)."
        )
    return nan_quantile(jnp.asarray(da), jnp.asarray(q), axis=dim)


def vecquantiles(da, rnk, dim):
    """Per-element quantile extraction: for each position of ``rnk``, the
    ``rnk``-th quantile of ``da`` along ``dim`` (reference nbutils.py:157-196)."""
    import jax.numpy as jnp

    from .ops.quantile import vecquantiles as _vq

    if isinstance(da, DataArray):
        (axis,) = _axis_of(da, dim)
        ranks = jnp.asarray(rnk.data if isinstance(rnk, DataArray) else rnk)
        out = _vq(jnp.asarray(da.data), ranks, axis=axis)
        dims = tuple(d for d in da.dims if d != dim)
        coords = {d: c for d, c in da.coords.items() if d in dims}
        return DataArray(out, dims, coords, dict(da.attrs), da.name)
    if not isinstance(dim, int):
        raise TypeError(
            f"vecquantiles on a bare array needs an integer axis, got dim={dim!r} "
            "(wrap the array in a DataArray to reduce by dimension name)."
        )
    return _vq(jnp.asarray(da), jnp.asarray(rnk), axis=dim)
