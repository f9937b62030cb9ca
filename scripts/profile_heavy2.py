"""Hardware timing of the sign-space merge/sort variants (heavy config)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
from xsdba_tpu.models._wrap import device_brackets
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.pallas.merge_kernel import (
    alternate_row_directions,
    merged_window_rows,
    sort_rows_alternating,
)
from xsdba_tpu.ops.quantile import _quantile_on_sorted, windowed_group_quantile
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


G, Ymax = plan.w1_gather.shape
givals = jnp.asarray(plan.w1_gather)
vals = jnp.where(givals < 0, jnp.nan, ref[..., jnp.clip(givals, 0, T - 1)])
raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((n_sites, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, plan.half, axis=1)
Sp.block_until_ready()
out_width = min(plan.wpad * plan.ypad, -(-(plan.window * Ymax) // 128) * 128)

res = {}


def rec(name, f):
    res[name] = timed(f)
    print(f"{name:28s} {res[name]*1000:8.1f} ms", flush=True)


rec("sort sign tile8", lambda: sort_rows_alternating(Sp))
rec("sort sign tile16", lambda: sort_rows_alternating(Sp, tile_b=16))
rec("sort XLA+flip", lambda: alternate_row_directions(jnp.sort(Sp, axis=-1), axis_rows=-2))
Sb = sort_rows_alternating(Sp)
Sb.block_until_ready()
rec("merge sign tile8", lambda: merged_window_rows(Sb, plan.window, G, out_width=out_width))
merged = merged_window_rows(Sb, plan.window, G, out_width=out_width)
merged.block_until_ready()
nv = jnp.full((n_sites, G), plan.window * Ymax, dtype=jnp.int32)
rec("extract", lambda: _quantile_on_sorted(merged, nv, q, 1.0, 1.0, sentinel="inf"))
rec("wgq (1 array)", lambda: windowed_group_quantile(ref, plan, q))


def step():
    af, hist_q = eqm_train_windowed(ref, hist, plan, q, kind="+")
    return qm_adjust_core(sim, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")


rec("full step", step)

# hardware parity spot-check: merge path vs exact gather+sort path
from xsdba_tpu.ops.quantile import grouped_nan_quantile

got = np.asarray(windowed_group_quantile(ref[:4], plan, q))
want = np.asarray(grouped_nan_quantile(ref[:4], gi.gather_idx, q))
print("parity maxabs vs re-sort path:", np.nanmax(np.abs(got - want)))

print(f"throughput: {n_sites * n_years / res['full step']:,.0f} gp-yr/s")
