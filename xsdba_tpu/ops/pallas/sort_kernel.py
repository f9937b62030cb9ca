"""Full-row key+payload sort in VMEM (bitonic network, roll + iota masks).

XLA's TPU sort runs at ~2.2 ns/element on the measured v5e — 62 ms for the
selection backend's [512, 54750] stage-1 sort, the single largest cost of
the windowed-quantile pipeline (docs/PERFORMANCE.md).  The in-VMEM bitonic
network below is compute-bound instead: a [B, T] sort is laid out as
[R, 128] lane-rows per site, each 128-lane row is bitonic-sorted with
direction alternating by row parity, and a merge cascade (the same
roll+iota formulation as ``merge_kernel._cascade_level``) then merges rows
dyadically — every exchange is a short sublane roll or a 128-lane roll,
never a T-wide shuffle.

Unlike the merge kernel's sign-space network (values only), stages here
carry an int32 PAYLOAD: the comparator bit is computed explicitly and both
arrays select on it.  Output values are exactly a sorted permutation (ties
may order differently from ``lax.sort`` — the selection backend consumes
the multiset of (value, payload) pairs, which is invariant).

The network is split into ONE kernel per cascade level (a monolithic
136-stage unroll sends Mosaic compile time past 15 minutes; per-level
kernels are ≤ 16 stages and compile in seconds, at the cost of one HBM
round-trip of the [B, T] pair per level — ~1 ms each at these shapes).

NaN handling is the caller's: keys must be NaN-free (+inf substitution with
a poisoned payload — see ``ops.selquant``); +inf-last equals NaN-last for
the downstream counting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .merge_kernel import _next_pow2

__all__ = ["sort_rows_with_payload"]

_M = 128  # lane width of the grid layout


def _iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _cx(key, lab, roll, stride: int, axis: int, want_min):
    """One compare-exchange stage at ``stride`` along ``axis``.

    ``want_min`` is the per-position mask: True keeps the smaller of
    (self, partner).  Partners live ``stride`` ahead for in-block low
    positions and ``stride`` behind for high ones; rolls wrap the whole
    axis but the iota masks only ever pair positions within one block.
    """
    idx = _iota(key.shape, axis)
    is_low = (idx & stride) == 0
    pk = jnp.where(is_low, roll(key, -stride, axis), roll(key, stride, axis))
    plab = jnp.where(is_low, roll(lab, -stride, axis), roll(lab, stride, axis))
    # pure i1 logic: a bool-valued where() would lower through an i8 select
    # + trunci, which Mosaic rejects
    take = (want_min & (pk < key)) | (~want_min & (pk > key))
    return jnp.where(take, pk, key), jnp.where(take, plab, lab)


def _phase1(key, lab, roll):
    """Bitonic-sort each m-lane row; direction alternates by row parity."""
    m = key.shape[-1]
    row = _iota(key.shape, key.ndim - 2)
    lane = _iota(key.shape, key.ndim - 1)
    rowpar = (row & 1) == 1
    k = 2
    while k <= m:
        desc = ((lane & k) != 0) ^ rowpar if k < m else rowpar
        s = k // 2
        while s >= 1:
            is_low = (lane & s) == 0
            key, lab = _cx(key, lab, roll, s, key.ndim - 1, is_low ^ desc)
            s //= 2
        k *= 2
    return key, lab


def _level(key, lab, roll, j: int):
    """Cascade level ``j``: merge 2**j-row runs into 2**(j+1)-row runs,
    output direction alternating so the next level's pairs stay bitonic."""
    m = key.shape[-1]
    row = _iota(key.shape, key.ndim - 2)
    lane = _iota(key.shape, key.ndim - 1)
    desc = ((row >> (j + 1)) & 1) == 1
    sr = 1 << j
    while sr >= 1:
        is_low = (row & sr) == 0
        key, lab = _cx(key, lab, roll, sr, key.ndim - 2, is_low ^ desc)
        sr //= 2
    s = m // 2
    while s >= 1:
        is_low = (lane & s) == 0
        key, lab = _cx(key, lab, roll, s, key.ndim - 1, is_low ^ desc)
        s //= 2
    return key, lab


def _pallas_stage(fn, k3, l3, tile_b: int, interpret: bool):
    from .merge_kernel import _ensure_pl, _roll_pallas

    pl = _ensure_pl()
    from jax.experimental.pallas import tpu as pltpu

    Bp, R, m = k3.shape

    def kernel(k_ref, l_ref, ok_ref, ol_ref):
        kk, ll = fn(k_ref[...], l_ref[...], _roll_pallas)
        ok_ref[...] = kk
        ol_ref[...] = ll

    spec = pl.BlockSpec((tile_b, R, m), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(Bp // tile_b,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, R, m), k3.dtype),
            jax.ShapeDtypeStruct((Bp, R, m), l3.dtype),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(k3, l3)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b", "use_kernel"))
def sort_rows_with_payload(
    key, lab, interpret: bool = False, tile_b: int = 8, use_kernel: bool = True
):
    """Sort each row of ``key`` [B, T] ascending, ``lab`` [B, T] int32
    following the same permutation.  Keys must be NaN-free (use +inf).

    Pads T to a power-of-two multiple of 128 with (+inf, 0) — callers that
    already pad can slice; the returned arrays keep the padded length so the
    selection backend's block machinery can consume them directly.
    """
    B, T = key.shape
    R = _next_pow2(-(-T // _M))
    Tp = R * _M
    if Tp > T:
        key = jnp.pad(key, ((0, 0), (0, Tp - T)), constant_values=jnp.inf)
        lab = jnp.pad(lab, ((0, 0), (0, Tp - T)))
    levels = R.bit_length() - 1

    if not use_kernel:
        from .merge_kernel import _roll_xla

        k3 = key.reshape(B, R, _M)
        l3 = lab.reshape(B, R, _M)
        k3, l3 = _phase1(k3, l3, _roll_xla)
        for j in range(levels):
            k3, l3 = _level(k3, l3, _roll_xla, j)
        return k3.reshape(B, Tp), l3.reshape(B, Tp)

    Bp = -(-B // tile_b) * tile_b
    if Bp != B:
        key = jnp.pad(key, ((0, Bp - B), (0, 0)), constant_values=jnp.inf)
        lab = jnp.pad(lab, ((0, Bp - B), (0, 0)))
    k3 = key.reshape(Bp, R, _M)
    l3 = lab.reshape(Bp, R, _M)
    k3, l3 = _pallas_stage(_phase1, k3, l3, tile_b, interpret)
    for j in range(levels):
        k3, l3 = _pallas_stage(
            functools.partial(lambda k, l, r, j=j: _level(k, l, r, j)),
            k3, l3, tile_b, interpret,
        )
    return k3.reshape(Bp, Tp)[:B], l3.reshape(Bp, Tp)[:B]
