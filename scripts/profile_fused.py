"""Round 3: one-dispatch fused heavy step vs the two-call path; fold tile_b=32."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import (
    eqm_train_adjust_windowed,
    eqm_train_windowed,
    qm_adjust_core,
)
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_sites, n_years, nq = 256, 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")
gpy = n_sites * n_years

ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
for a in (ref, hist, sim):
    a.block_until_ready()
_ = float(jnp.nansum(jnp.arange(8.0)))


def step_two(r):
    af, hist_q = eqm_train_windowed(r, hist, plan, q, kind="+")
    scen = qm_adjust_core(
        sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"
    )
    return jnp.nansum(scen)


def step_fused(r):
    scen, _, _ = eqm_train_adjust_windowed(
        r, hist, sim, plan, q, brackets, kind="+", interp="linear", extrapolation="constant"
    )
    return jnp.nansum(scen)


def timed_chain(step, n=8):
    # bench.py-style chained loop: per-iteration wall includes the probe
    # round-trip exactly as the driver's bench measures it
    acc = step(ref)
    float(acc)
    t0 = time.perf_counter()
    r = ref
    for _ in range(n):
        acc = step(r)
        r = ref + 0 * acc
    float(acc)
    return (time.perf_counter() - t0) / n


def rec(name, f, *a, **k):
    try:
        v = f(*a, **k)
        print(f"{name:40s} {v*1000:8.1f} ms   {gpy/v:,.0f} gp-yr/s ({gpy/v/324000:.3f}x)", flush=True)
        return v
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:200]}", flush=True)
        return None


rec("two-call step (bench r2 shape)", timed_chain, step_two)
rec("fused one-dispatch step", timed_chain, step_fused)

# parity
a0, h0 = eqm_train_windowed(ref, hist, plan, q, kind="+")
s0 = np.asarray(qm_adjust_core(sim, h0, a0, brackets, kind="+", interp="linear", extrapolation="constant"))
s1 = np.asarray(eqm_train_adjust_windowed(ref, hist, sim, plan, q, brackets, kind="+")[0])
print("fused parity maxabs:", float(np.nanmax(np.abs(s0 - s1))), flush=True)

# ---- fold tile_b=32 attempt ------------------------------------------------
from xsdba_tpu.ops.pallas import merge_kernel as mk

s_probe = jnp.asarray(rng.normal(0, 1, (2 * n_sites, plan.dp, plan.ypad)).astype(np.float32))
s_sorted = mk.sort_rows_alternating(s_probe)
s_sorted.block_until_ready()
G = gi.n_groups
out_width = min(plan.wpad * plan.ypad, -(-(31 * 150) // plan.ypad) * plan.ypad)


def timed(f, n=6):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    return (time.perf_counter() - t0) / n


for tb in (16, 32):
    rec(
        f"shared fold B=512 tile_b={tb}",
        timed,
        lambda tb=tb: mk.merged_window_rows_shared(
            s_sorted, 31, G, tile_b=tb, out_width=out_width, ymax=150
        ),
    )
