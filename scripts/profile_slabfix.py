"""Measure the aligned-transpose slab fix on the heavy config (B=256 sites)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_adjust_windowed, eqm_train_windowed, qm_adjust_core
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


def timed(name, f, n=6, gpy=None):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    dt = (time.perf_counter() - t0) / n
    extra = f"   {gpy/dt:,.0f} gp-yr/s ({gpy/dt/324000:.3f}x)" if gpy else ""
    print(f"{name:42s} {dt*1000:8.1f} ms{extra}", flush=True)
    return dt


from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows_shared, sort_rows_alternating

s_probe = jnp.asarray(rng.normal(0, 1, (2 * n_sites, plan.dp, plan.ypad)).astype(np.float32))
ss = sort_rows_alternating(s_probe)
ss.block_until_ready()
timed("ANCHOR fold (tile16, B=512)", lambda: merged_window_rows_shared(ss, 31, gi.n_groups, out_width=4864, ymax=150))

af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
af.block_until_ready()
timed("train (aligned slab)", lambda: eqm_train_windowed(ref, hist, plan, q, kind="+")[0], gpy=gpy)
timed("adjust (aligned regular)", lambda: qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"), gpy=gpy)


def full():
    scen, _, _ = eqm_train_adjust_windowed(ref, hist, sim, plan, q, brackets, kind="+", interp="linear", extrapolation="constant")
    return scen


timed("FULL fused step", full, gpy=gpy)
