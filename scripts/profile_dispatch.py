"""Separate relay per-dispatch latency from chip compute in the heavy bench.

Three measurements in one process (same relay weather):
  1. trivial jitted op, 8 chained dispatches  -> pure dispatch overhead
  2. fused heavy step, 8 chained dispatches   -> what bench.py measures now
  3. lax.scan of 8 fused heavy steps, ONE dispatch -> chip-bound throughput
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_adjust_windowed
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_sites, n_years, nq = 256, 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
rng = np.random.default_rng(1)
T = len(t)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")
gpy = n_sites * n_years

ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
_ = float(jnp.nansum(jnp.arange(8.0)))


def timed(name, f, n=3, per=1):
    s = float(jnp.asarray(f()))  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jnp.asarray(f())) + 0 * s
    dt = (time.perf_counter() - t0) / n / per
    extra = f"   {gpy/dt:,.0f} gp-yr/s ({gpy/dt/324000:.3f}x)" if per > 1 or "step" in name else ""
    print(f"{name:44s} {dt*1000:8.1f} ms{extra}", flush=True)
    return dt


@jax.jit
def triv(x):
    return jnp.nansum(x * 1.000001)


def chain_trivial():
    acc = jnp.float32(0.0)
    for _ in range(8):
        acc = triv(ref + 0 * acc)
    return acc


def step(r):
    scen, _, _ = eqm_train_adjust_windowed(
        r, hist, sim, gi.merge_plan, q, brackets,
        kind="+", interp="linear", extrapolation="constant",
    )
    return jnp.nansum(scen)


def chain_steps():
    r = ref
    acc = None
    for _ in range(8):
        acc = step(r)
        r = ref + 0 * acc
    return acc


@jax.jit
def scan_steps(r0):
    def body(carry, _):
        acc = step(carry)
        return ref + 0 * acc, acc

    _, accs = jax.lax.scan(body, r0, None, length=8)
    return jnp.nansum(accs)


timed("trivial x8 dispatches (per dispatch)", chain_trivial, per=8)
timed("heavy step x8 dispatches (per step)", chain_steps, per=8)
timed("heavy step x8 IN-GRAPH scan (per step)", lambda: scan_steps(ref), per=8)
timed("trivial x8 dispatches again (drift check)", chain_trivial, per=8)
