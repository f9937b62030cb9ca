"""NaN-aware batched quantiles on TPU.

Replaces the reference's numba kernels (``nbutils.py:24-271``): per-row in-place
sort + type-7 (Hyndman-Fan; ``alpha=beta=1``) linear interpolation, NaN-aware.

TPU design: one ``jnp.sort`` over the reduced axis (XLA sorts NaNs last, like
numpy), then a vectorized gather + lerp — no Python-level row loop.  Everything
is shape-static and vmappable over arbitrary leading batch dims, so XLA tiles
it onto the VPU and fuses the surrounding elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nan_quantile", "grouped_nan_quantile", "vecquantiles"]


def _virtual_index(valid_count, quantiles, alpha: float, beta: float):
    # Reference nbutils.py:130: n*q + (alpha + q*(1-alpha-beta)) - 1
    return valid_count * quantiles + (alpha + quantiles * (1 - alpha - beta)) - 1


def _lerp(left, right, gamma):
    # Symmetric lerp for fp accuracy — mirrors nbutils.py:77-106.
    diff = right - left
    out = left + diff * gamma
    return jnp.where(gamma >= 0.5, right - diff * (1 - gamma), out)


def _quantile_on_sorted(sorted_x, valid, quantiles, alpha, beta):
    """Type-7 quantiles given a pre-sorted (NaNs-last) last axis.

    sorted_x: [..., n]; valid: [...] count of non-NaN entries;
    quantiles: [..., nq] (broadcastable against leading dims).
    Returns [..., nq].
    """
    n = sorted_x.shape[-1]
    v = valid[..., None].astype(sorted_x.dtype)
    vi = _virtual_index(v, quantiles, alpha, beta)
    prev = jnp.floor(vi)
    # Bounds handling (nbutils.py:30-68): above valid-1 -> last element of the
    # *full* row (index -1, NaN when NaNs present — later clipped to the max
    # valid value); below 0 -> first element.
    above = vi >= v - 1
    below = vi < 0
    prev_idx = jnp.clip(prev, 0, n - 1).astype(jnp.int32)
    next_idx = jnp.clip(prev + 1, 0, n - 1).astype(jnp.int32)
    last = jnp.int32(n - 1)
    prev_idx = jnp.where(above, last, jnp.where(below, 0, prev_idx))
    next_idx = jnp.where(above, last, jnp.where(below, 0, next_idx))

    left = jnp.take_along_axis(sorted_x, prev_idx, axis=-1)
    right = jnp.take_along_axis(sorted_x, next_idx, axis=-1)
    gamma = (vi - prev).astype(sorted_x.dtype)
    interp = _lerp(left, right, gamma)
    # NaN range clip: replace NaN interpolation by the max valid value
    # (nbutils.py:144-147).  All-NaN rows keep NaN (max_valid is NaN there).
    max_idx = jnp.clip(valid[..., None] - 1, 0, n - 1).astype(jnp.int32)
    max_valid = jnp.take_along_axis(sorted_x, max_idx, axis=-1)
    return jnp.where(jnp.isnan(interp), max_valid, interp)


def nan_quantile(x, quantiles, axis: int = -1, alpha: float = 1.0, beta: float = 1.0):
    """NaN-aware quantiles along ``axis``; matches ``np.nanquantile`` for
    ``alpha=beta=1`` (reference ``nbutils.py:113-148``).

    ``quantiles`` is a 1-D array of nq probabilities.  The reduced axis is
    replaced by a trailing ``nq`` axis.
    """
    x = jnp.asarray(x)
    quantiles = jnp.asarray(quantiles, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    sorted_x = jnp.sort(x, axis=-1)  # NaNs sort to the end
    valid = jnp.sum(~jnp.isnan(x), axis=-1)
    return _quantile_on_sorted(sorted_x, valid, quantiles, alpha, beta)


def vecquantiles(x, ranks, axis: int = -1, alpha: float = 1.0, beta: float = 1.0):
    """Quantile where the probability differs per row (reference
    ``nbutils.py:151-195``): ``x`` [..., n], ``ranks`` [...] -> [...].

    NaN rank yields NaN.
    """
    x = jnp.asarray(x)
    ranks = jnp.asarray(ranks, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    sorted_x = jnp.sort(x, axis=-1)
    valid = jnp.sum(~jnp.isnan(x), axis=-1)
    q = jnp.nan_to_num(ranks)[..., None]
    out = _quantile_on_sorted(sorted_x, valid, q, alpha, beta)[..., 0]
    return jnp.where(jnp.isnan(ranks), jnp.nan, out)


def grouped_nan_quantile(x, gather_idx, quantiles, alpha: float = 1.0, beta: float = 1.0, group_chunk: int | None = None):
    """Fused gather -> sort -> lerp grouped quantile.

    x: [..., T]; gather_idx: [G, L] int32 with -1 padding (see
    ``Grouper.indexes``); quantiles: [nq].  Returns [..., G, nq].

    This is the TPU lowering of the reference's rolling-window groupby quantile
    (``base.py:261-265`` + ``nbutils.quantile``): window padding positions are
    -1 and become NaN, exactly like the NaN pads of ``rolling.construct``.

    ``group_chunk`` bounds peak memory: groups are processed ``group_chunk``
    at a time with ``lax.map`` so only a [..., chunk, L] slice of the gather
    matrix is ever materialized (windowed dayofyear groups would otherwise
    allocate [..., 366, years*window] — tens of GB at production size).
    By default a chunk is picked to keep the slice near ~2^28 elements.
    """
    x = jnp.asarray(x)
    gi = jnp.asarray(gather_idx)
    G, L = gi.shape
    batch = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    if group_chunk is None:
        budget = 1 << 28
        group_chunk = max(1, min(G, budget // max(batch * L, 1)))

    def one_chunk(gidx_chunk):
        mask = gidx_chunk < 0
        vals = x[..., jnp.clip(gidx_chunk, 0, x.shape[-1] - 1)]   # [..., C, L]
        vals = jnp.where(mask, jnp.nan, vals)
        return nan_quantile(vals, quantiles, axis=-1, alpha=alpha, beta=beta)

    if group_chunk >= G:
        return one_chunk(gi)

    # pad G to a multiple of the chunk, map over chunks, then crop
    n_chunks = -(-G // group_chunk)
    pad = n_chunks * group_chunk - G
    gi_p = jnp.concatenate([gi, jnp.full((pad, L), -1, gi.dtype)], axis=0) if pad else gi
    chunks = gi_p.reshape(n_chunks, group_chunk, L)
    out = jax.lax.map(one_chunk, chunks)                           # [n_chunks, ..., C, nq]
    out = jnp.moveaxis(out, 0, -3)                                  # [..., n_chunks, C, nq]
    out = out.reshape(out.shape[:-3] + (n_chunks * group_chunk, out.shape[-1]))
    return out[..., :G, :]
