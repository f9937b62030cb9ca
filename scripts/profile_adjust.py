"""Adjust-path internals + merge tile64 probe (heavy config shapes)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.interp import _interp_unrolled, _pad_cyclic_tables
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows, sort_rows_alternating
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_sites, n_years, nq = 128, 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)
ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")
_ = float(jnp.nansum(jnp.arange(8.0)))


def timed(f, n=8):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    return (time.perf_counter() - t0) / n


def rec(name, f):
    try:
        v = timed(f)
        print(f"{name:34s} {v*1000:8.1f} ms", flush=True)
        return v
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:140]}", flush=True)


rec("warmrow", lambda: jnp.nansum(sim))

af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
af.block_until_ready(); hist_q.block_until_ready()

part0, g0, slot0, part1, g1, slot1, w = brackets
Lp = part0.shape[1]


@jax.jit
def a_gather(v):
    pi = part0
    return jnp.where(pi >= 0, v[..., jnp.clip(pi, 0, v.shape[-1] - 1)], jnp.nan)


@jax.jit
def a_tables(hist_q, af):
    return _pad_cyclic_tables(hist_q, af)


@jax.jit
def a_interp(v, hist_q, af):
    vals = a_gather.__wrapped__(v)
    xq_p, yq_p, nv_p = _pad_cyclic_tables(hist_q, af)
    return _interp_unrolled(vals, xq_p, yq_p, nv_p, "linear", "constant")


@jax.jit
def a_scatter(v, hist_q, af):
    out = a_interp.__wrapped__(v, hist_q, af)
    return out[..., g0, slot0]


rec("adjust: partition gather", lambda: a_gather(sim))
rec("adjust: + interp unrolled", lambda: a_interp(sim, hist_q, af))
rec("adjust: + scatter back", lambda: a_scatter(sim, hist_q, af))
rec("adjust: full qm_adjust_core", lambda: qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"))

# merge tile sweep on stacked slab
G, Ymax = plan.w1_gather.shape
giv = jnp.asarray(plan.w1_gather)
v2 = jnp.where(giv < 0, jnp.nan, jnp.concatenate([ref, hist])[..., jnp.clip(giv, 0, T - 1)])
raw = jnp.where(jnp.isnan(v2), jnp.inf, v2)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((256, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=1)
Sb = sort_rows_alternating(Sp)
Sb.block_until_ready()
ng = G - 2 * plan.half
ow = -(-(plan.window * Ymax) // plan.ypad) * plan.ypad
rec("merge 256 tile32", lambda: merged_window_rows(Sb, plan.window, ng, tile_b=32, out_width=ow))
rec("merge 256 tile64", lambda: merged_window_rows(Sb, plan.window, ng, tile_b=64, out_width=ow))
rec("sort 256 tile16", lambda: sort_rows_alternating(Sp))
rec("sort 256 tile32", lambda: sort_rows_alternating(Sp, tile_b=32))
