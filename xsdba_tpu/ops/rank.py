"""Average ranks with NaN handling, TPU-style.

Replicates xarray/bottleneck ``nanrankdata`` semantics used by the reference
(``utils.py:575-646``): equal values get the average of their would-be ranks,
ranks start at 1, NaNs stay NaN; ``pct`` divides by the valid count.  The
reference then rescales pct ranks to span [0, 1] exactly
(``rnk = mx*(rnk-mn)/(mx-mn)``, ``utils.py:631-634``), which we reproduce.

Implementation: instead of bottleneck's sequential scan, ranks are computed
as ``(left + right + 1) / 2`` where ``left``/``right`` are the insertion points
of each value in its own sorted row — two searchsorteds over one sort, fully
batched and XLA-fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["average_rank", "pct_rank", "rank_pct_rescaled"]


def _searchsorted_rows(sorted_x, v, side):
    # jnp.searchsorted is 1-D; vectorize over leading dims.
    fn = lambda s, q: jnp.searchsorted(s, q, side=side)
    for _ in range(sorted_x.ndim - 1):
        fn = jax.vmap(fn)
    return fn(sorted_x, v)


def average_rank(x, axis: int = -1):
    """Average rank along ``axis``; NaNs -> NaN; ranks start at 1."""
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, -1)
    nan = jnp.isnan(x)
    key = jnp.where(nan, jnp.inf, x)
    sorted_x = jnp.sort(key, axis=-1)
    left = _searchsorted_rows(sorted_x, key, "left")
    right = _searchsorted_rows(sorted_x, key, "right")
    # clip `right` so NaN entries (inf key) don't overcount other infs — they
    # are masked to NaN below anyway.
    rnk = (left + right + 1).astype(x.dtype) / 2
    rnk = jnp.where(nan, jnp.nan, rnk)
    return jnp.moveaxis(rnk, -1, axis)


def pct_rank(x, axis: int = -1):
    """Percentage rank in (0, 1]: rank / n_valid (xarray ``rank(pct=True)``)."""
    x = jnp.asarray(x)
    rnk = average_rank(x, axis=axis)
    nvalid = jnp.sum(~jnp.isnan(x), axis=axis, keepdims=True).astype(rnk.dtype)
    return rnk / jnp.where(nvalid == 0, 1, nvalid)


def rank_pct_rescaled(x, axis: int = -1):
    """Reference pct rank: rescaled so min -> 0 and max -> mx
    (``utils.py:631-634``: ``mx*(rnk-mn)/(mx-mn)``)."""
    r = pct_rank(x, axis=axis)
    mn = jnp.nanmin(r, axis=axis, keepdims=True)
    mx = jnp.nanmax(r, axis=axis, keepdims=True)
    denom = mx - mn
    return jnp.where(denom == 0, 0.0, mx * (r - mn) / jnp.where(denom == 0, 1, denom))
