"""Round 6: tile32 merge + batch scaling of the heavy step."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows, sort_rows_alternating
from xsdba_tpu.ops.quantile import windowed_group_quantile
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_years, nq = 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
print("edge groups:", len(plan.edge_ids), flush=True)
rng = np.random.default_rng(1)
T = len(t)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")

_ = float(jnp.nansum(jnp.arange(8.0)))


def timed(f, n=6):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    return (time.perf_counter() - t0) / n


def rec(name, f, gpy=None):
    try:
        v = timed(f)
        extra = f"   {gpy/v:,.0f} gp-yr/s ({gpy/v/324000:.3f}x)" if gpy else ""
        print(f"{name:34s} {v*1000:8.1f} ms{extra}", flush=True)
        return v
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:150]}", flush=True)
        return None


def mk(n_sites):
    ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
    sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
    for a in (ref, hist, sim):
        a.block_until_ready()
    return ref, hist, sim


def step(ref, hist, sim):
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


ref, hist, sim = mk(128)

# merge kernel tile sweep on the stacked (256-row) slab
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
rec("merge 256-slab tile16", lambda: merged_window_rows(Sb, plan.window, ng, tile_b=16, out_width=ow))
rec("merge 256-slab tile32", lambda: merged_window_rows(Sb, plan.window, ng, tile_b=32, out_width=ow))

rec("wgq (128 sites)", lambda: windowed_group_quantile(ref, plan, q))

# --- staged bisection of the jitted core (128 sites, 1 array) ------------
from functools import partial as _p

from xsdba_tpu.ops.quantile import _plan_device_arrays, _quantile_on_sorted

w1_dev, _, _ = _plan_device_arrays(plan)
Gx = plan.w1_gather.shape[0]


@jax.jit
def stage_prep(x):
    giv = w1_dev
    vals = jnp.where(giv < 0, jnp.nan, x[..., jnp.clip(giv, 0, T - 1)])
    V = jnp.sum(~jnp.isnan(vals), axis=-1).astype(jnp.int32)
    raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
    raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
    Sp = jnp.full((x.shape[0], plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
    return jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=1), V


@jax.jit
def stage_sort(x):
    Sp, V = stage_prep.__wrapped__(x)
    return sort_rows_alternating(Sp), V


@jax.jit
def stage_merge(x):
    Sb, V = stage_sort.__wrapped__(x)
    return merged_window_rows(Sb, plan.window, ng, out_width=ow), V


@jax.jit
def stage_full(x):
    merged, V = stage_merge.__wrapped__(x)
    cs = jnp.cumsum(jnp.pad(V, ((0, 0), (0, 1))), axis=-1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))
    idx = jnp.arange(ng)
    nv = cs[..., idx + plan.window] - cs[..., idx]
    merged = merged.reshape(merged.shape[0], ng, -1)
    return _quantile_on_sorted(merged, nv, q, 1.0, 1.0, sentinel="inf")


rec("stage prep", lambda: stage_prep(ref)[0])
rec("stage prep+sort", lambda: stage_sort(ref)[0])
rec("stage prep+sort+merge", lambda: stage_merge(ref)[0])
rec("stage full core", lambda: stage_full(ref))
rec("full step 128", lambda: step(ref, hist, sim), gpy=128 * n_years)

ref2, hist2, sim2 = mk(256)
rec("full step 256", lambda: step(ref2, hist2, sim2), gpy=256 * n_years)

ref3, hist3, sim3 = mk(512)
rec("full step 512", lambda: step(ref3, hist3, sim3), gpy=512 * n_years)
