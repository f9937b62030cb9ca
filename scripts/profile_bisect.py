"""In-program bisect of the heavy train: compile prefixes of the pipeline
(slab | +sort | +fold | +extract | +factors) as separate jit programs and
time them interleaved, twice, so relay drift is visible.  The marginal cost
of stage k is t[k] - t[k-1] measured WITHIN one program (XLA fusion real)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from xsdba_tpu.ops.correction import equally_spaced_nodes, get_correction
from xsdba_tpu.ops.pallas.merge_kernel import (
    merged_window_rows_shared,
    sort_rows_alternating,
)
from xsdba_tpu.ops.quantile import _static_strip_extract
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_sites, n_years, nq = 256, 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)

ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
for a in (ref, hist):
    a.block_until_ready()
_ = float(jnp.nansum(jnp.arange(8.0)))

half, window, ypad, wpad, dp = plan.half, plan.window, plan.ypad, plan.wpad, plan.dp
P = plan.regular_period
G = gi.n_groups
Ymax = plan.w1_gather.shape[1]
out_width = min(wpad * ypad, -(-(window * Ymax) // ypad) * ypad)
counts = tuple(int(c) for c in plan.nv_host)
q_static = tuple(float(v) for v in np.asarray(equally_spaced_nodes(nq), np.float64))
edge_tuple = tuple(int(e) for e in plan.edge_ids)
qdev = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))


@partial(jax.jit, static_argnames=("stage",))
def upto(ref, hist, stage: int):
    x = jnp.stack([ref, hist], axis=0)
    lead_ = x.shape[:-1]
    Y = x.shape[-1] // P
    resh = x.reshape(lead_ + (Y, P))
    Ppad = -(-P // 128) * 128
    Ypad_t = -(-Y // 8) * 8
    resh = jnp.pad(resh, [(0, 0)] * (resh.ndim - 2) + [(0, Ypad_t - Y), (0, Ppad - P)])
    core = jnp.swapaxes(resh, -1, -2)[..., :P, :Y]
    napad = jnp.full(lead_ + (half, 1), jnp.nan, x.dtype)
    head = jnp.concatenate([core[..., P - half : P, : Y - 1], napad], axis=-1)
    tail = jnp.concatenate([core[..., 0:half, 1:], napad], axis=-1)
    vals = jnp.concatenate([head, core, tail], axis=-2)
    V = jnp.sum(~jnp.isnan(vals), axis=-1).astype(jnp.int32)
    raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
    if ypad > Ymax:
        raw = jnp.pad(raw, [(0, 0)] * (raw.ndim - 1) + [(0, ypad - Ymax)], constant_values=jnp.inf)
    Sp = jnp.full(lead_ + (dp, ypad), jnp.inf, dtype=raw.dtype)
    Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=raw.ndim - 2)
    B = int(np.prod(lead_))
    Sb = Sp.reshape((B, dp, ypad))
    if stage == 1:
        return jnp.nansum(jnp.where(jnp.isinf(Sb), 0.0, Sb)) + jnp.sum(V)
    Ss = sort_rows_alternating(Sb)
    if stage == 2:
        return jnp.nansum(jnp.where(jnp.isinf(Ss), 0.0, Ss))
    merged = merged_window_rows_shared(Ss, window, G, out_width=out_width, ymax=Ymax)
    if stage == 3:
        return jnp.nansum(jnp.where(jnp.isinf(merged), 0.0, merged))
    merged = merged.reshape(lead_ + (G, merged.shape[-1]))
    out = _static_strip_extract(merged, counts, q_static, edge_tuple, 1.0, 1.0)
    if stage == 4:
        return jnp.nansum(out)
    af = get_correction(out[1], out[0], "+")
    return jnp.nansum(af)


def timed(f, n=6):
    s = f()
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = f() + 0 * s
    float(s)
    return (time.perf_counter() - t0) / n


for rep in range(2):
    base = 0.0
    for stage in range(1, 6):
        dt = timed(lambda: upto(ref, hist, stage))
        print(f"rep{rep} stage{stage}: {dt*1000:8.1f} ms   (marginal {1000*(dt-base):+8.1f})", flush=True)
        base = dt
