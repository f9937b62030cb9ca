"""Quantile-table lookup: the adjust-time hot path.

Replaces the reference's ``interp_on_quantiles`` (``utils.py:317-513``):

- ungrouped: per-slice ``scipy.interp1d`` with constant/NaN extrapolation from
  the first/last *non-NaN* table entries (``utils.py:350-377``);
- grouped: 2-D ``scipy.griddata`` over (value, fractional group index) with
  cyclic group padding + numba constant extrapolation
  (``utils.py:380-400``, ``nbutils.py:397-416``).

TPU design: the ungrouped case is one batched masked-searchsorted + lerp.  The
grouped case is *separable*: evaluate the 1-D interpolant of the two groups
bracketing each timestep's fractional index (cyclically padded) and blend
linearly — the structured equivalent of griddata's triangulation on this
quasi-regular grid (documented deviation: identical on the regular interior,
smoother near group boundaries).  Both are static-shape, vmap/pjit friendly,
and fuse into the surrounding correction arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interp1d_table", "interp_on_quantiles_grouped", "searchsorted_batched"]


def searchsorted_batched(sorted_x, v, side: str = "right"):
    """searchsorted vectorized over matching leading dims."""
    fn = lambda s, q: jnp.searchsorted(s, q, side=side)
    for _ in range(sorted_x.ndim - 1):
        fn = jax.vmap(fn)
    return fn(sorted_x, v)


def _compact_nan_pairs(xq, yq):
    """Drop (x, y) pairs where either is NaN by sorting them to the end.

    Matches the reference's mask ``isnan(oldx)|isnan(oldy)`` (utils.py:351).
    xq is assumed ascending (quantile tables); the compaction keeps order.
    Returns (xs, ys, nvalid) with invalid xs set to +inf.
    """
    bad = jnp.isnan(xq) | jnp.isnan(yq)
    key = jnp.where(bad, jnp.inf, xq)
    order = jnp.argsort(key, axis=-1)
    xs = jnp.take_along_axis(key, order, axis=-1)
    ys = jnp.take_along_axis(yq, order, axis=-1)
    nvalid = jnp.sum(~bad, axis=-1)
    return xs, ys, nvalid


def interp1d_table(v, xq, yq, method: str = "linear", extrap: str = "constant"):
    """Evaluate the monotone table (xq, yq) at points v, batched.

    v: [..., T]; xq, yq: [..., nq] (leading dims broadcastable with v's).
    NaN pairs in the table are ignored; NaN in v stays NaN.
    ``extrap``: 'constant' fills beyond the table with the first/last valid
    yq; 'nan' fills with NaN (reference utils.py:353-368).
    ``method``: 'linear' or 'nearest'.
    """
    v = jnp.asarray(v)
    xs, ys, nvalid = _compact_nan_pairs(jnp.asarray(xq), jnp.asarray(yq))
    nq = xs.shape[-1]
    last = jnp.clip(nvalid - 1, 0, nq - 1)

    x_first = xs[..., :1]
    x_last = jnp.take_along_axis(xs, last[..., None], axis=-1)
    y_first = ys[..., :1]
    y_last = jnp.take_along_axis(ys, last[..., None], axis=-1)

    j = searchsorted_batched(xs, v, side="right")
    k = jnp.clip(j - 1, 0, jnp.maximum(nvalid - 2, 0)[..., None])
    x0 = jnp.take_along_axis(xs, k, axis=-1)
    x1 = jnp.take_along_axis(xs, jnp.clip(k + 1, 0, nq - 1), axis=-1)
    y0 = jnp.take_along_axis(ys, k, axis=-1)
    y1 = jnp.take_along_axis(ys, jnp.clip(k + 1, 0, nq - 1), axis=-1)

    dx = x1 - x0
    t = jnp.where(dx > 0, (v - x0) / jnp.where(dx == 0, 1, dx), 0.0)
    if method == "linear":
        out = y0 + t * (y1 - y0)
    elif method == "nearest":
        out = jnp.where(jnp.abs(v - x0) <= jnp.abs(x1 - v), y0, y1)
    else:
        raise NotImplementedError(f"method={method!r}")

    below = v < x_first
    above = v > x_last
    if extrap == "constant":
        out = jnp.where(below, y_first, out)
        out = jnp.where(above, y_last, out)
    elif extrap == "nan":
        out = jnp.where(below | above, jnp.nan, out)
    else:
        raise ValueError(f"extrapolation must be 'constant' or 'nan', got {extrap!r}")

    # single-valid-point table: constant
    out = jnp.where((nvalid[..., None] == 1), jnp.broadcast_to(y_first, out.shape), out) if extrap == "constant" else out
    # empty table or NaN input -> NaN
    out = jnp.where(nvalid[..., None] == 0, jnp.nan, out)
    return jnp.where(jnp.isnan(v), jnp.nan, out)


def interp_on_quantiles_grouped(
    v,
    frac_idx,
    xq,
    yq,
    group_positions,
    method: str = "linear",
    extrap: str = "constant",
):
    """Grouped quantile-table lookup with cyclic group blending.

    v: [..., T] values to look up; frac_idx: [T] fractional group index
    (1-based month/doy style — see ``Grouper.interp_index``);
    xq, yq: [..., G, nq] per-group tables; group_positions: [G] the group
    coordinate values (e.g. 1..12 for months).

    Equivalent of reference ``utils.py:409-513``: groups are cyclically padded
    (``add_cyclic_bounds``, utils.py:284-314) so indexes below the first /
    above the last group blend with the wrapped-around group.  For each
    timestep the two bracketing group tables are evaluated in 1-D and blended
    linearly by the fractional offset.
    """
    v = jnp.asarray(v)
    xq = jnp.asarray(xq)
    yq = jnp.asarray(yq)
    frac = jnp.asarray(frac_idx, dtype=v.dtype)
    pos = jnp.asarray(group_positions, dtype=v.dtype)
    G = xq.shape[-2]

    # Cyclic padding: prepend the last group at pos[0]-step0, append the first
    # at pos[-1]+step1 (reference utils.py:284-314, cyclic_coords=False).
    if G > 1:
        step0 = pos[1] - pos[0]
        step1 = pos[-1] - pos[-2]
        pos_p = jnp.concatenate([pos[:1] - step0, pos, pos[-1:] + step1])
        xq_p = jnp.concatenate([xq[..., -1:, :], xq, xq[..., :1, :]], axis=-2)
        yq_p = jnp.concatenate([yq[..., -1:, :], yq, yq[..., :1, :]], axis=-2)
    else:
        pos_p, xq_p, yq_p = pos, xq, yq

    if method == "nearest" or G == 1:
        g = jnp.clip(jnp.searchsorted(pos_p, frac, side="left"), 1, pos_p.shape[0] - 1)
        g = jnp.where(frac - pos_p[g - 1] < pos_p[g] - frac, g - 1, g)
        xg = jnp.take(xq_p, g, axis=-2)
        yg = jnp.take(yq_p, g, axis=-2)
        return _interp_rowwise(v, xg, yg, method, extrap)

    # bracketing pad-space groups and blend weight
    g1 = jnp.clip(jnp.searchsorted(pos_p, frac, side="right"), 1, pos_p.shape[0] - 1)
    g0 = g1 - 1
    p0 = pos_p[g0]
    p1 = pos_p[g1]
    w = jnp.where(p1 > p0, (frac - p0) / jnp.where(p1 == p0, 1, p1 - p0), 0.0)

    lo = _interp_rowwise(v, jnp.take(xq_p, g0, axis=-2), jnp.take(yq_p, g0, axis=-2), method, extrap)
    hi = _interp_rowwise(v, jnp.take(xq_p, g1, axis=-2), jnp.take(yq_p, g1, axis=-2), method, extrap)
    return (1 - w) * lo + w * hi


def _interp_rowwise(v, xg, yg, method, extrap):
    """Per-timestep table interp: v [..., T], xg/yg [..., T, nq] -> [..., T]."""
    def one(vt, xt, yt):
        return interp1d_table(vt[None], xt, yt, method, extrap)[0]

    fn = jax.vmap(one)  # over T
    for _ in range(v.ndim - 1):
        fn = jax.vmap(fn)
    return fn(v, jnp.broadcast_to(xg, v.shape + (xg.shape[-1],)), jnp.broadcast_to(yg, v.shape + (yg.shape[-1],)))
