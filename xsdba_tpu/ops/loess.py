"""Robust LOESS smoothing (Cleveland 1979), batched for TPU.

Replaces the reference's numba kernel (``loess.py:16-179``): the per-point
Python loop becomes one [n, R] sliding-window gather + batched weighted
least squares per robustness iteration — vectorized over points and batch
dims, static shapes throughout.

Semantics mirror the reference's equal-spacing fast path exactly
(``loess.py:108-155``): window size ``r = 2*floor(f*n/2)+1``, boundary
bandwidth shrinkage, tricube/gaussian kernels, biweight robustness
reweighting.  NaN handling deviates by design: instead of compressing NaNs
(dynamic shapes), NaN points get zero weight — identical results for NaN-free
data, and a documented approximation otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["loess_smoothing"]


def _tricube(u):
    # reference loess.py:29-34
    w = (1 - u**3) ** 3
    return jnp.where(u >= 1, 0.0, w)


def _gaussian(u):
    # reference loess.py:17-26: f spans 95% of the gaussian
    w = jnp.exp(-(u**2) / (2 * (1 / 1.96) ** 2))
    return jnp.where(u >= 1, 0.0, w)


_WEIGHT_FUNCS = {"tricube": _tricube, "gaussian": _gaussian}


@partial(jax.jit, static_argnames=("f", "niter", "d", "weights"))
def _loess_equal_core(y, x, *, f: float, niter: int, d: int, weights: str):
    """y: [..., n]; x: [n] equally spaced.  Returns smoothed y."""
    y = jnp.asarray(y)
    n = y.shape[-1]
    x = jnp.asarray(x, dtype=y.dtype)
    dx = x[1] - x[0] if n > 1 else jnp.asarray(1.0, y.dtype)
    wfunc = _WEIGHT_FUNCS[weights]

    # window sizing — reference loess.py:114-120
    r = int(2 * (int(f * n) // 2) + 1)
    r = min(r, n)
    hw = (r - 1) // 2
    R = min(r + 4, n)
    HW = hw + 2

    i = jnp.arange(n)
    start = jnp.clip(i - HW, 0, n - R)                     # [n]
    win = start[:, None] + jnp.arange(R)[None, :]          # [n, R]
    xw = x[win]                                            # [n, R]
    diffs = jnp.abs(xw - x[:, None])
    # bandwidth h per point — reference loess.py:138-147
    h_interior = (hw + 1) * dx
    h_left = (r - i) * dx
    h_right = (i - (n - r) + 1) * dx
    h = jnp.where(i < hw, h_left, jnp.where(i >= n - hw, h_right, h_interior))
    wi = wfunc(diffs / h[:, None])                         # [n, R]

    yw = y[..., win]                                       # [..., n, R]
    nanw = jnp.isnan(yw)
    yw0 = jnp.where(nanw, 0.0, yw)

    def smooth(delta):
        w = wi * delta[..., win] * (~nanw)
        if d == 0:
            est = jnp.sum(w * yw0, axis=-1) / jnp.sum(w, axis=-1)
        else:
            # weighted linear regression evaluated at x_i (loess.py:41-46)
            sw = jnp.sum(w, axis=-1)
            swx = jnp.sum(w * xw, axis=-1)
            swx2 = jnp.sum(w * xw * xw, axis=-1)
            swy = jnp.sum(w * yw0, axis=-1)
            swxy = jnp.sum(w * xw * yw0, axis=-1)
            det = sw * swx2 - swx * swx
            b1 = (sw * swxy - swx * swy) / det
            b0 = (swy - b1 * swx) / sw
            est = b0 + b1 * x
        return est

    delta = jnp.ones_like(y)
    est = smooth(delta)
    for _ in range(niter - 1):
        resid = y - est
        s = jnp.nanmedian(jnp.abs(resid), axis=-1, keepdims=True)
        xres = jnp.where(s == 0, (resid != 0).astype(y.dtype), resid / jnp.where(s == 0, 1, 6.0 * s))
        delta = jnp.where(jnp.abs(xres) >= 1, 0.0, (1 - xres**2) ** 2)
        delta = jnp.where(jnp.isnan(delta), 0.0, delta)
        est = smooth(delta)
    return jnp.where(jnp.isnan(y), jnp.nan, est)


def loess_smoothing(
    y,
    x,
    f: float = 0.5,
    niter: int = 2,
    d: int = 1,
    weights: str = "tricube",
):
    """LOESS-smooth ``y`` [..., n] over coordinate ``x`` [n].

    Mirrors reference ``loess.py:182-279`` defaults.  ``d`` in {0, 1}.
    """
    if d not in (0, 1):
        raise NotImplementedError("Only d=0 and d=1 are implemented.")
    if weights not in _WEIGHT_FUNCS:
        raise ValueError(f"weights must be one of {sorted(_WEIGHT_FUNCS)}")
    return _loess_equal_core(jnp.asarray(y), x, f=float(f), niter=int(niter), d=int(d), weights=weights)
