"""Shared-dyadic merge tile sweep vs per-group cascade (stacked 256 slab)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.ops.pallas.merge_kernel import (
    merged_window_rows,
    merged_window_rows_shared,
    sort_rows_alternating,
)
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper

n_years = 150
t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
gi = Grouper("time.dayofyear", window=31).indexes(t)
plan = gi.merge_plan
rng = np.random.default_rng(1)
T = len(t)
ref = jnp.asarray(rng.normal(10, 2, (256, T)).astype(np.float32))
_ = float(jnp.nansum(jnp.arange(8.0)))

G, Ymax = plan.w1_gather.shape
giv = jnp.asarray(plan.w1_gather)
v2 = jnp.where(giv < 0, jnp.nan, ref[..., jnp.clip(giv, 0, T - 1)])
raw = jnp.where(jnp.isnan(v2), jnp.inf, v2)
raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - Ymax)), constant_values=jnp.inf)
Sp = jnp.full((256, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=1)
Sb = sort_rows_alternating(Sp)
Sb.block_until_ready()
ng = G - 2 * plan.half
ow = -(-(plan.window * Ymax) // plan.ypad) * plan.ypad


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
        print(f"{name:34s} {v*1000:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:140]}", flush=True)


rec("per-group tile32", lambda: merged_window_rows(Sb, plan.window, ng, tile_b=32, out_width=ow))
rec("shared tile8", lambda: merged_window_rows_shared(Sb, plan.window, ng, tile_b=8, out_width=ow, ymax=Ymax))
rec("shared tile16", lambda: merged_window_rows_shared(Sb, plan.window, ng, tile_b=16, out_width=ow, ymax=Ymax))
rec("shared tile32", lambda: merged_window_rows_shared(Sb, plan.window, ng, tile_b=32, out_width=ow, ymax=Ymax))

a = np.asarray(merged_window_rows(Sb[:8], plan.window, ng, out_width=ow))
b = np.asarray(merged_window_rows_shared(Sb[:8], plan.window, ng, out_width=ow, ymax=Ymax))
w = min(a.shape[-1], b.shape[-1])
print("parity:", np.array_equal(np.nan_to_num(a[..., :w], posinf=1e30), np.nan_to_num(b[..., :w], posinf=1e30)))
