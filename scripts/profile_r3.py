"""Round 3: regular-layout reshape paths + fold tile experiments on the heavy config."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import Brackets, device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_years, nq = 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
print("regular_period:", plan.regular_period, "edges:", len(plan.edge_ids), flush=True)
rng = np.random.default_rng(1)
T = len(t)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")
br_noreg = Brackets(*brackets, regular0=None)

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
        print(f"{name:40s} {v*1000:8.1f} ms{extra}", flush=True)
        return v
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:180]}", flush=True)
        return None


n_sites = 256
gpy = n_sites * n_years
ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
for a in (ref, hist, sim):
    a.block_until_ready()

import dataclasses

plan_noreg = dataclasses.replace(plan, regular_period=None)


def train_reg():
    return eqm_train_windowed(ref, hist, plan, q, kind="+")[0]


def train_noreg():
    return eqm_train_windowed(ref, hist, plan_noreg, q, kind="+")[0]


af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
af.block_until_ready()


def adjust_reg():
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


def adjust_noreg():
    return qm_adjust_core(sim, hist_q, af, br_noreg, kind="+", interp="linear", extrapolation="constant")


def full_reg():
    a, h = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, h, a, brackets, kind="+", interp="linear", extrapolation="constant")


def full_noreg():
    a, h = eqm_train_windowed(ref, hist, plan_noreg, q, kind="+")
    return qm_adjust_core(sim, h, a, br_noreg, kind="+", interp="linear", extrapolation="constant")


rec("train r2 (gather slab)", train_noreg, gpy)
rec("train r3 (regular reshape slab)", train_reg, gpy)
rec("adjust r2 (partition gathers)", adjust_noreg, gpy)
rec("adjust r3 (regular transpose)", adjust_reg, gpy)
v2 = rec("FULL STEP r2 path", full_noreg, gpy)
v3 = rec("FULL STEP r3 path", full_reg, gpy)

# parity
o2 = np.asarray(full_noreg())
o3 = np.asarray(full_reg())
print("full-step parity maxabs:", float(np.nanmax(np.abs(o2 - o3))), flush=True)

# ---- fold tile experiment: tile_b=32 -------------------------------------
from xsdba_tpu.ops.pallas import merge_kernel as mk

s_probe = jnp.asarray(rng.normal(0, 1, (n_sites, plan.dp, plan.ypad)).astype(np.float32))
s_sorted = mk.sort_rows_alternating(s_probe)
s_sorted.block_until_ready()
G = gi.n_groups
out_width = min(plan.wpad * plan.ypad, -(-(31 * 150) // plan.ypad) * plan.ypad)

for tb in (8, 16, 32):
    rec(
        f"shared fold tile_b={tb}",
        lambda tb=tb: mk.merged_window_rows_shared(
            s_sorted, 31, G, tile_b=tb, out_width=out_width, ymax=150
        ),
    )
