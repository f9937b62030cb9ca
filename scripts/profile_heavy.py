"""Hardware breakdown of the heavy config (EQM doy+31w) step pieces."""

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


def timed(f, *a, n=6, **kw):
    # sync through a scalar fetch (relay-safe)
    s = jnp.nansum(jnp.asarray(f(*a, **kw)))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f(*a, **kw))) + 0 * s
    float(s)
    return (time.perf_counter() - t0) / n


# pieces
G, Ymax = plan.w1_gather.shape
givals = jnp.asarray(plan.w1_gather)
vals = jnp.where(givals < 0, jnp.nan, ref[..., jnp.clip(givals, 0, T - 1)])
raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((n_sites, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, plan.half, axis=1)
Sp.block_until_ready()
out_width = min(plan.wpad * plan.ypad, -(-(plan.window * Ymax) // 128) * 128)

t_sort = timed(lambda: sort_rows_alternating(Sp))
Sb = sort_rows_alternating(Sp)
t_merge = timed(lambda: merged_window_rows(Sb, plan.window, G, out_width=out_width))
merged = merged_window_rows(Sb, plan.window, G, out_width=out_width)

from xsdba_tpu.ops.quantile import _quantile_on_sorted

nv = jnp.full((n_sites, G), plan.window * Ymax, dtype=jnp.int32)  # no NaN here
t_extract = timed(lambda: _quantile_on_sorted(merged, nv, q, 1.0, 1.0, sentinel="inf"))

t_wgq = timed(lambda: windowed_group_quantile(ref, plan, q))

t_gather_prep = timed(lambda: jnp.where(givals < 0, jnp.nan, ref[..., jnp.clip(givals, 0, T - 1)]))


def full_train():
    af, hq = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return af


t_train = timed(full_train)

af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
t_adjust = timed(lambda: qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"))


def step():
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


t_step = timed(step)

print(f"sites={n_sites} years={n_years} G={G} Ymax={Ymax} ypad={plan.ypad} wpad={plan.wpad} out_width={out_width}")
for k, v in [
    ("gather+prep (1 array)", t_gather_prep),
    ("row sort (1 array)", t_sort),
    ("merge kernel (1 array)", t_merge),
    ("quantile extract (1 array)", t_extract),
    ("windowed_group_quantile (1 array)", t_wgq),
    ("eqm_train_windowed (2 arrays)", t_train),
    ("qm_adjust", t_adjust),
    ("full step", t_step),
]:
    print(f"{k:38s} {v*1000:8.1f} ms")
print(f"throughput: {n_sites * n_years / t_step:,.0f} gp-yr/s")
