"""Pallas kernel: per-row quantile-table interpolation.

The adjust-time lookup in partition layout — values [R, L] where every row
has its own monotone table (xs, ys) [R, nq] — is the framework's hottest
elementwise op.  This kernel keeps each row's table in VMEM next to the
compute and streams the values through in lane-aligned tiles, evaluating the
unrolled locate+select entirely on the VPU: one HBM read of the values, one
write of the results, tables read once per tile row.

Semantics identical to ``ops.interp._interp_unrolled`` with
``method='linear'``/``extrap='constant'`` on compacted tables (NaN pairs
pre-sorted to +inf, per-row valid counts): parity-tested against the XLA
path.  ``interp_table_pallas_3d`` serves the partitioned grouped lookup on
TPU (``ops.interp.interp_grouped_partitioned`` dispatches to it) — XLA
leaves the 50-step locate/select chain ~10x off roofline, the in-VMEM form
reads values once and keeps every intermediate in registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interp_table_pallas", "interp_table_pallas_3d", "pallas_available"]


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401

        return True
    except Exception:
        return False


def _interp_body(v, xs_k, ys_k, nv, nq: int):
    """Shared locate+select body.  ``v`` [..., L]; ``xs_k(k)``/``ys_k(k)``
    return the k-th table column shaped [..., 1]; ``nv`` [..., 1]."""
    cnt = jnp.zeros(v.shape, dtype=jnp.int32)
    for k in range(nq):
        cnt = cnt + (xs_k(k) <= v)
    k0 = jnp.clip(cnt - 1, 0, jnp.maximum(nv - 2, 0))

    x0 = jnp.zeros_like(v)
    x1 = jnp.zeros_like(v)
    y0 = jnp.zeros_like(v)
    y1 = jnp.zeros_like(v)
    x_last = jnp.zeros_like(v)
    y_last = jnp.zeros_like(v)
    last = jnp.clip(nv - 1, 0, nq - 1)
    for k in range(nq):
        xk = xs_k(k)
        yk = ys_k(k)
        m0 = k0 == k
        x0 = jnp.where(m0, xk, x0)
        y0 = jnp.where(m0, yk, y0)
        if k < nq - 1:
            x1 = jnp.where(m0, xs_k(k + 1), x1)
            y1 = jnp.where(m0, ys_k(k + 1), y1)
        else:
            x1 = jnp.where(m0, jnp.inf, x1)
            y1 = jnp.where(m0, yk, y1)
        ml = last == k
        x_last = jnp.where(ml, xk, x_last)
        y_last = jnp.where(ml, yk, y_last)

    dx = x1 - x0
    t = jnp.where(dx > 0, (v - x0) / jnp.where(dx == 0, 1.0, dx), 0.0)
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    out = y0 + t * (y1 - y0)
    out = jnp.where(v < xs_k(0), ys_k(0), out)
    out = jnp.where(v > x_last, y_last, out)
    out = jnp.where(nv == 0, jnp.nan, out)
    return jnp.where(jnp.isnan(v), jnp.nan, out)


def _kernel(v_ref, xs_ref, ys_ref, nv_ref, out_ref, *, nq: int):
    out_ref[...] = _interp_body(
        v_ref[...],
        lambda k: xs_ref[:, k : k + 1],
        lambda k: ys_ref[:, k : k + 1],
        nv_ref[...],
        nq,
    )


def _kernel3d(v_ref, xs_ref, ys_ref, nv_ref, out_ref, *, nq: int):
    out_ref[...] = _interp_body(
        v_ref[...],
        lambda k: xs_ref[:, :, k : k + 1],
        lambda k: ys_ref[:, :, k : k + 1],
        nv_ref[...],
        nq,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def interp_table_pallas_3d(v, xs, ys, nvalid, interpret: bool = False):
    """Partition-layout lookup: v [B, Gp, Lp]; xs/ys [B, Gp, nq] compacted
    per-(batch, group) tables; nvalid [B, Gp] -> [B, Gp, Lp].

    Linear interpolation, constant extrapolation (the QM adjust hot path).
    Lanes carry the full Lp axis (no pad waste), sublanes a group block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Gp, Lp = v.shape
    nq = xs.shape[-1]
    TB = min(16, B) if B % min(16, B) == 0 else 1
    GB = 32  # pad the group axis up — small group blocks starve the grid
    Gpp = -(-Gp // GB) * GB
    if Gpp != Gp:
        v = jnp.pad(v, ((0, 0), (0, Gpp - Gp), (0, 0)), constant_values=jnp.nan)
        xs = jnp.pad(xs, ((0, 0), (0, Gpp - Gp), (0, 0)), constant_values=jnp.inf)
        ys = jnp.pad(ys, ((0, 0), (0, Gpp - Gp), (0, 0)), constant_values=jnp.nan)
        nvalid = jnp.pad(nvalid, ((0, 0), (0, Gpp - Gp)))
    nv3 = nvalid.astype(jnp.int32)[..., None]

    out = pl.pallas_call(
        functools.partial(_kernel3d, nq=nq),
        grid=(B // TB, Gpp // GB),
        in_specs=[
            pl.BlockSpec((TB, GB, Lp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((TB, GB, nq), lambda i, j: (i, j, 0)),
            pl.BlockSpec((TB, GB, nq), lambda i, j: (i, j, 0)),
            pl.BlockSpec((TB, GB, 1), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((TB, GB, Lp), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Gpp, Lp), v.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(v, xs, ys, nv3)
    return out[:, :Gp, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def interp_table_pallas(v, xs, ys, nvalid, interpret: bool = False):
    """v [R, L]; xs/ys [R, nq] compacted tables; nvalid [R] -> [R, L].

    linear interpolation, constant extrapolation (the QM hot path).
    """
    from jax.experimental import pallas as pl

    R, L = v.shape
    nq = xs.shape[-1]
    TR = 8
    TL = 512
    # pad to tile multiples
    Rp = -(-R // TR) * TR
    Lp = -(-L // TL) * TL
    vpad = jnp.pad(v, ((0, Rp - R), (0, Lp - L)), constant_values=jnp.nan)
    xpad = jnp.pad(xs, ((0, Rp - R), (0, 0)), constant_values=jnp.inf)
    ypad = jnp.pad(ys, ((0, Rp - R), (0, 0)), constant_values=jnp.nan)
    nvpad = jnp.pad(nvalid.astype(jnp.int32).reshape(-1, 1), ((0, Rp - R), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, nq=nq),
        grid=(Rp // TR, Lp // TL),
        in_specs=[
            pl.BlockSpec((TR, TL), lambda i, j: (i, j)),
            pl.BlockSpec((TR, nq), lambda i, j: (i, 0)),
            pl.BlockSpec((TR, nq), lambda i, j: (i, 0)),
            pl.BlockSpec((TR, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TR, TL), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Rp, Lp), v.dtype),
        interpret=interpret,
    )(vpad, xpad, ypad, nvpad)
    return out[:R, :L]
