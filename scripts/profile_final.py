"""Final bisect of the heavy train at current state (stacked 256 slab)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows_shared, sort_rows_alternating
from xsdba_tpu.ops.quantile import _finite_probe, _plan_device_arrays, windowed_group_quantile
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_years, nq = 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)
ref = jnp.asarray(rng.normal(10, 2, (128, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (128, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (128, T)).astype(np.float32))
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")
both = jnp.concatenate([ref, hist])
both.block_until_ready()
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


def probe_only():
    return _finite_probe(both)


t0 = time.perf_counter()
for _ in range(8):
    bool(_finite_probe(both))
print(f"{'probe (8x sync fetch)':34s} {(time.perf_counter()-t0)/8*1000:8.1f} ms", flush=True)

rec("wgq stacked (one call)", lambda: windowed_group_quantile(both, plan, q))

G, Ymax = plan.w1_gather.shape
giv, _, _ = _plan_device_arrays(plan)
v2 = jnp.where(giv < 0, jnp.nan, both[..., jnp.clip(giv, 0, T - 1)])
raw = jnp.where(jnp.isnan(v2), jnp.inf, v2)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((256, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=1)
Sb = sort_rows_alternating(Sp)
Sb.block_until_ready()
ng = G - 2 * plan.half
ow = -(-(plan.window * Ymax) // plan.ypad) * plan.ypad
rec("shared merge tile16", lambda: merged_window_rows_shared(Sb, plan.window, ng, out_width=ow, ymax=Ymax))
rec("shared merge tile32", lambda: merged_window_rows_shared(Sb, plan.window, ng, tile_b=32, out_width=ow, ymax=Ymax))

def step():
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")

v = rec("full step 128", step)
if v:
    print(f"throughput: {128 * n_years / v:,.0f} gp-yr/s ({128*n_years/v/324000:.3f}x)")
