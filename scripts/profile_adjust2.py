"""Dissect the heavy-config adjust path: where do the ~54 ms go?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import apply_correction, equally_spaced_nodes
from xsdba_tpu.ops.interp import _pad_cyclic_tables
from xsdba_tpu.ops.pallas.interp_kernel import interp_table_pallas_3d
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_sites, n_years, nq = 256, 150, 50
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
rng = np.random.default_rng(1)
T = len(t)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
brackets = device_brackets(gi, "linear")

ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
af, hist_q = eqm_train_windowed(ref, hist, gi.merge_plan, q, kind="+")
af.block_until_ready()
hist_q.block_until_ready()
_ = float(jnp.nansum(jnp.arange(8.0)))

P, Y = 365, n_years


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
        print(f"{name:44s} {v*1000:8.1f} ms", flush=True)
        return v
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:160]}", flush=True)
        return None


# full adjust
rec("qm_adjust_core (full)", lambda: qm_adjust_core(
    sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"))

# stage 1: cyclic pad + NaN compaction of tables
pad_tabs = jax.jit(lambda x, y: _pad_cyclic_tables(x, y))
rec("pad+compact tables", lambda: pad_tabs(hist_q, af)[0])

xq_p, yq_p, nv_p = pad_tabs(hist_q, af)
xq_p.block_until_ready()

# stage 2: the transpose in
trans_in = jax.jit(lambda v: jnp.swapaxes(v.reshape(n_sites, Y, P), -1, -2))
rec("sim reshape+swapaxes in", lambda: trans_in(sim))
core = trans_in(sim)
core.block_until_ready()

# stage 3: kernel on pre-shaped input (sliced tables rows 1..P)
xs = xq_p[:, 1 : P + 1, :]
ys = yq_p[:, 1 : P + 1, :]
nv = nv_p[:, 1 : P + 1]
xs.block_until_ready()
rec("interp kernel [256,365,150]", lambda: interp_table_pallas_3d(core, xs, ys, nv))
out_k = interp_table_pallas_3d(core, xs, ys, nv)
out_k.block_until_ready()

# stage 4: transpose out
trans_out = jax.jit(lambda o: jnp.swapaxes(o, -1, -2).reshape(n_sites, T))
rec("swapaxes+reshape out", lambda: trans_out(out_k))
af_t = trans_out(out_k)
af_t.block_until_ready()

# stage 5: apply correction
corr = jax.jit(lambda s, a: apply_correction(s, a, "+"))
rec("apply_correction", lambda: corr(sim, af_t))

# fused stages 2..5 in one jit (what the core should cost)
@jax.jit
def manual(simv, xsv, ysv, nvv):
    c = jnp.swapaxes(simv.reshape(n_sites, Y, P), -1, -2)
    o = interp_table_pallas_3d(c, xsv, ysv, nvv)
    a = jnp.swapaxes(o, -1, -2).reshape(n_sites, T)
    return apply_correction(simv, a, "+")

rec("fused transpose+kernel+corr", lambda: manual(sim, xs, ys, nv))

# parity
a0 = np.asarray(qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"))
a1 = np.asarray(manual(sim, xs, ys, nv))
print("parity maxabs:", float(np.nanmax(np.abs(a0 - a1))), flush=True)
