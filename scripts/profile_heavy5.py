"""Round 5: jitted core + tile16 + stacked train, end-to-end heavy step."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows, sort_rows_alternating
from xsdba_tpu.ops.quantile import grouped_nan_quantile, windowed_group_quantile
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

_ = float(jnp.nansum(jnp.arange(8.0)))  # connection warm


def timed(f, n=6):
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
        print(f"{name:30s} {v*1000:8.1f} ms", flush=True)
        return v
    except Exception as e:
        print(f"{name:30s} FAILED: {str(e)[:150]}", flush=True)
        return None


rec("wgq jitted (1 array)", lambda: windowed_group_quantile(ref, plan, q))
rec("train stacked (2 arrays)", lambda: eqm_train_windowed(ref, hist, plan, q, kind="+")[0])
af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
rec("adjust", lambda: qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"))


def step():
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


v = rec("full step", step)

got = np.asarray(windowed_group_quantile(ref[:4], plan, q))
want = np.asarray(grouped_nan_quantile(ref[:4], gi.gather_idx, q))
print("parity maxabs vs re-sort path:", np.nanmax(np.abs(got - want)), flush=True)
if v:
    print(f"throughput: {n_sites * n_years / v:,.0f} gp-yr/s  ({n_sites*n_years/v/324000:.3f}x north star)")
