"""Windowed-group merge kernel: k-way merge of pre-sorted lists in VMEM.

The TPU answer to the reference's rolling-window grouped quantile
(``base.py:261-265`` + ``nbutils.quantile``): a 31-day window amplifies the
sort workload 31x because every value participates in 31 groups.  Instead of
re-sorting the amplified gather matrix (XLA sort ~ 100 effective HBM passes),
sort each day-of-year's per-year list ONCE (1x data, tiny rows), then merge
the ``window`` pre-sorted lists of each group entirely in VMEM with a
Batcher bitonic-merge cascade — one HBM read of the (1x) sorted lists, one
write of the merged rows, all compare-exchange work on the VPU.

Padding is +inf (not NaN): min/max networks are NaN-unsafe, and +inf-last
ordering equals XLA's NaN-last sort order for finite data.  Valid counts are
tracked separately (see ``ops.quantile.windowed_group_quantile``).

The merge math (`merge_pairs`, `merge_sorted_lists`) is plain jnp shared by
the Pallas kernel and the XLA fallback path, so both produce bit-identical
merged rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "merge_pairs",
    "merge_sorted_lists",
    "merged_window_rows",
    "merged_window_rows_xla",
]


def _cmpex(z, s: int):
    """Compare-exchange at stride ``s`` along the last axis (bitonic stage)."""
    L = z.shape[-1]
    nb = L // (2 * s)
    z = z.reshape(z.shape[:-1] + (nb, 2, s))
    lo = jnp.minimum(z[..., 0, :], z[..., 1, :])
    hi = jnp.maximum(z[..., 0, :], z[..., 1, :])
    z = jnp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2)
    return z.reshape(z.shape[:-3] + (L,))


def merge_pairs(a, b):
    """Merge two ascending lists along the last axis: [..., m]+[..., m] -> [..., 2m].

    ``m`` must be a power of two; entries may include +inf padding.
    """
    c = jnp.concatenate([a, jnp.flip(b, axis=-1)], axis=-1)  # bitonic
    s = c.shape[-1] // 2
    while s >= 1:
        c = _cmpex(c, s)
        s //= 2
    return c


def merge_sorted_lists(x):
    """Merge ``W`` ascending lists: [..., W, m] -> [..., W*m] ascending.

    ``W`` and ``m`` must be powers of two (+inf-pad to reach them).
    """
    while x.shape[-2] > 1:
        x = merge_pairs(x[..., 0::2, :], x[..., 1::2, :])
    return x[..., 0, :]


def _merge_kernel(a_ref, b_ref, out_ref, *, window: int, wpad: int, dblock: int):
    """One (site-tile, group) program: slice the window rows, merge, emit.

    a_ref/b_ref are two consecutive ``dblock``-row blocks of the same padded
    sorted-lists array (the aligned-pair trick: any ``wpad``-row window of the
    doy axis lies inside two consecutive aligned blocks).
    """
    g = pl.program_id(1)
    off = g - (g // dblock) * dblock
    rows = jnp.concatenate([a_ref[...], b_ref[...]], axis=1)  # [TB, 2*dblock, m]
    win = jax.lax.dynamic_slice_in_dim(rows, off, wpad, axis=1)  # [TB, wpad, m]
    if wpad > window:
        ridx = jax.lax.broadcasted_iota(jnp.int32, (1, wpad, 1), 1)
        win = jnp.where(ridx >= window, jnp.inf, win)
    out_ref[...] = merge_sorted_lists(win)


# populated lazily so the module imports without pallas
pl = None


def _ensure_pl():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl
    return pl


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(
    jax.jit, static_argnames=("window", "n_groups", "interpret", "tile_b")
)
def merged_window_rows(
    s_pad, window: int, n_groups: int, interpret: bool = False, tile_b: int = 8
):
    """Merge each group's ``window`` consecutive pre-sorted rows in VMEM.

    s_pad: [B, Dp, m] float32 — per-(site, day) ascending lists, +inf padded,
    laid out so group ``g``'s window is rows ``[g, g+window)``; ``Dp`` must be
    a multiple of ``dblock`` with one spare block past the last window (the
    caller pads; see ``ops.quantile._window_plan``).  Returns
    [B, n_groups, wpad*m] merged ascending rows (+inf tails).
    """
    pl = _ensure_pl()
    B, Dp, m = s_pad.shape
    wpad = _next_pow2(window)
    dblock = max(wpad, 32)
    assert Dp % dblock == 0, (Dp, dblock)
    assert n_groups + wpad <= Dp, "need one spare block past the last window"
    Bp = -(-B // tile_b) * tile_b
    if Bp != B:
        s_pad = jnp.pad(s_pad, ((0, Bp - B), (0, 0), (0, 0)), constant_values=jnp.inf)

    # output flattened over (group, merged) — a (tile_b, wpad*m) block keeps
    # the trailing block dims on the TPU (8, 128) grid (a (tile_b, 1, wpad*m)
    # block would put 1 on the sublane axis, which Mosaic rejects)
    out = pl.pallas_call(
        functools.partial(
            _merge_kernel, window=window, wpad=wpad, dblock=dblock
        ),
        grid=(Bp // tile_b, n_groups),
        in_specs=[
            pl.BlockSpec((tile_b, dblock, m), lambda i, g: (i, g // dblock, 0)),
            pl.BlockSpec((tile_b, dblock, m), lambda i, g: (i, g // dblock + 1, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, wpad * m), lambda i, g: (i, g)),
        out_shape=jax.ShapeDtypeStruct((Bp, n_groups * wpad * m), s_pad.dtype),
        interpret=interpret,
    )(s_pad, s_pad)
    return out[:B].reshape(B, n_groups, wpad * m)


@functools.partial(jax.jit, static_argnames=("window", "n_groups"))
def merged_window_rows_xla(s_pad, window: int, n_groups: int):
    """Pure-XLA fallback with identical outputs (used off-TPU / for parity).

    Gathers the window rows per group then runs the same merge cascade; the
    compare-exchange stages round-trip HBM here, so this is only competitive
    with re-sorting — the Pallas path is the fast one.
    """
    B, Dp, m = s_pad.shape
    wpad = _next_pow2(window)
    base = jnp.arange(n_groups)[:, None] + jnp.arange(wpad)[None, :]  # [G, wpad]
    win = s_pad[:, base, :]  # [B, G, wpad, m]
    if wpad > window:
        win = jnp.where(jnp.arange(wpad)[None, None, :, None] >= window, jnp.inf, win)
    return merge_sorted_lists(win)
