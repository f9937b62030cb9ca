"""Round 4: grid-layout cascade + one-hot extraction, end-to-end heavy step."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows, sort_rows_alternating
from xsdba_tpu.ops.quantile import _quantile_on_sorted, grouped_nan_quantile, windowed_group_quantile
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


G, Ymax = plan.w1_gather.shape
givals = jnp.asarray(plan.w1_gather)
vals = jnp.where(givals < 0, jnp.nan, ref[..., jnp.clip(givals, 0, T - 1)])
raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((n_sites, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, plan.half, axis=1)
Sp.block_until_ready()
out_width = min(plan.wpad * plan.ypad, -(-(plan.window * Ymax) // plan.ypad) * plan.ypad)

# warm the chip with a dummy so the first measured kernel isn't penalized
_ = float(jnp.nansum(jnp.sort(Sp[:8, :, :128], axis=-1)))

rec("warm jnp.sort slab", lambda: jnp.sort(Sp, axis=-1))
rec("sort tile16", lambda: sort_rows_alternating(Sp, tile_b=16))
rec("sort tile32", lambda: sort_rows_alternating(Sp, tile_b=32))
Sb = sort_rows_alternating(Sp)
Sb.block_until_ready()
rec("merge GRID tile8", lambda: merged_window_rows(Sb, plan.window, G, out_width=out_width))
rec("merge GRID tile16", lambda: merged_window_rows(Sb, plan.window, G, tile_b=16, out_width=out_width))
merged = merged_window_rows(Sb, plan.window, G, out_width=out_width)
merged.block_until_ready()
nv = jnp.full((n_sites, G), plan.window * Ymax, dtype=jnp.int32)
rec("extract (cond one-hot)", lambda: _quantile_on_sorted(merged, nv, q, 1.0, 1.0, sentinel="inf"))
rec("wgq (1 array)", lambda: windowed_group_quantile(ref, plan, q))


def step():
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


v = rec("full step", step)

got = np.asarray(windowed_group_quantile(ref[:4], plan, q))
want = np.asarray(grouped_nan_quantile(ref[:4], gi.gather_idx, q))
print("parity maxabs vs re-sort path:", np.nanmax(np.abs(got - want)))
if v:
    print(f"throughput: {n_sites * n_years / v:,.0f} gp-yr/s  ({n_sites*n_years/v/324000:.3f}x north star)")
