"""Heavy-step batch scaling at the current optimization state."""

import time

import numpy as np

import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_years, nq = 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)
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


def step(ref, hist, sim):
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


for n_sites in (128, 256, 384):
    ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
    sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
    for a in (ref, hist, sim):
        a.block_until_ready()
    v = timed(lambda: step(ref, hist, sim))
    gpy = n_sites * n_years
    print(f"step {n_sites:4d} sites: {v*1000:8.1f} ms   {gpy/v:,.0f} gp-yr/s ({gpy/v/324000:.3f}x)", flush=True)
