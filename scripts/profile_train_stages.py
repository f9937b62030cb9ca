"""Dissect the heavy-config TRAIN path stage by stage (256 sites, doy+31w).

train r3 measures ~220 ms; fold tile16 is ~94 ms; sort ~15 ms.  Where is the
rest?  Each stage below is its own jitted program on prebuilt device inputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from xsdba_tpu.models._algos import eqm_train_windowed
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
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))

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
print(f"P={P} G={G} ypad={ypad} wpad={wpad} dp={dp} Ymax={Ymax} out_width={out_width}", flush=True)


def timed(name, f, n=6):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1000:8.1f} ms", flush=True)
    return dt


@jax.jit
def slab_build(ref, hist):
    x = jnp.stack([ref, hist], axis=0)
    lead_ = x.shape[:-1]
    Y = x.shape[-1] // P
    core = jnp.swapaxes(x.reshape(lead_ + (Y, P)), -1, -2)
    napad = jnp.full(lead_ + (half, 1), jnp.nan, x.dtype)
    head = jnp.concatenate([core[..., P - half : P, : Y - 1], napad], axis=-1)
    tail = jnp.concatenate([core[..., 0:half, 1:], napad], axis=-1)
    vals = jnp.concatenate([head, core, tail], axis=-2)
    raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
    if ypad > Ymax:
        raw = jnp.pad(raw, [(0, 0)] * (raw.ndim - 1) + [(0, ypad - Ymax)], constant_values=jnp.inf)
    lead = x.shape[:-1]
    Sp = jnp.full(lead + (dp, ypad), jnp.inf, dtype=raw.dtype)
    Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=raw.ndim - 2)
    B = int(np.prod(lead))
    return Sp.reshape((B, dp, ypad))


Sb = slab_build(ref, hist)
Sb.block_until_ready()
timed("slab build (stack+transpose+pad)", lambda: slab_build(ref, hist))

Ss = sort_rows_alternating(Sb)
Ss.block_until_ready()
timed("row sort (pallas)", lambda: sort_rows_alternating(Sb))

merged = merged_window_rows_shared(Ss, window, G, out_width=out_width, ymax=Ymax)
merged.block_until_ready()
timed("levels+fold (shared, tile16)", lambda: merged_window_rows_shared(Ss, window, G, out_width=out_width, ymax=Ymax))

counts = tuple(int(c) for c in plan.nv_host)
q_static = tuple(float(v) for v in np.asarray(equally_spaced_nodes(nq), np.float64))
edge_tuple = tuple(int(e) for e in plan.edge_ids)


@jax.jit
def extract(m2):
    return _static_strip_extract(m2, counts, q_static, edge_tuple, 1.0, 1.0)


m2 = merged.reshape(2, n_sites, G, merged.shape[-1])
m2.block_until_ready()
timed("static strip extraction", lambda: extract(m2))


@jax.jit
def factors(qq):
    return get_correction(qq[1], qq[0], "+")


qq = extract(m2)
qq.block_until_ready()
timed("correction factors", lambda: factors(qq))


def train_full():
    return eqm_train_windowed(ref, hist, plan, q, kind="+")[0]


timed("FULL train (committed path)", train_full)
