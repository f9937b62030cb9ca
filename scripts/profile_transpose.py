"""Kill the slab-build transpose: [B, Y=150, P=365] -> [B, P, Ypad=256].

The committed reshape+swapaxes chain measures ~135 ms at B=512 — a gather
lowering.  Candidates, anchored against the fold in the same run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, Y, P, YP = 512, 150, 365, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (B, Y * P)).astype(np.float32))
x.block_until_ready()
_ = float(jnp.nansum(jnp.arange(8.0)))


def timed(name, f, n=6):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1000:8.1f} ms", flush=True)
    return dt


@jax.jit
def t_swap(x):
    return jnp.swapaxes(x.reshape(B, Y, P), -1, -2)


@jax.jit
def t_swap_padded(x):
    c = x.reshape(B, Y, P)
    c = jnp.pad(c, ((0, 0), (0, YP - Y), (0, 384 - P)))
    return jnp.swapaxes(c, -1, -2)


@jax.jit
def t_mxu(x):
    # transpose-by-identity on the MXU: out[b,p,z] = sum_y c[b,y,p] I[y,z];
    # exact for finite f32 (every product is x*1 or x*0)
    c = x.reshape(B, Y, P)
    eye = jnp.eye(Y, YP, dtype=jnp.float32)
    return jax.lax.dot_general(
        c, eye, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )  # [B, P, YP]


@jax.jit
def t_mxu_masked(x):
    # NaN-safe: zero the NaNs for the value matmul, transpose the mask the
    # same way, rebuild +inf pads/NaNs after
    c = x.reshape(B, Y, P)
    bad = jnp.isnan(c)
    cz = jnp.where(bad, 0.0, c)
    eye = jnp.eye(Y, YP, dtype=jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    vt = jax.lax.dot_general(cz, eye, dims, precision=jax.lax.Precision.HIGHEST)
    mt = jax.lax.dot_general(
        bad.astype(jnp.float32), eye, dims, precision=jax.lax.Precision.HIGHEST
    )
    pad_lane = jax.lax.broadcasted_iota(jnp.int32, vt.shape, 2) >= Y
    return jnp.where(jnp.logical_or(mt > 0.5, pad_lane), jnp.inf, vt)


r0 = np.asarray(t_swap(x))
for name, f in [
    ("swapaxes (committed)", t_swap),
    ("swapaxes on padded pow2 dims", t_swap_padded),
    ("MXU identity transpose", t_mxu),
    ("MXU masked (NaN-safe, inf pads)", t_mxu_masked),
]:
    timed(name, lambda f=f: f(x))

# parity
r_mxu = np.asarray(t_mxu(x))[:, :, :Y]
print("mxu parity maxabs:", float(np.abs(r_mxu - r0).max()), flush=True)
r_m = np.asarray(t_mxu_masked(x))
print("masked parity maxabs:", float(np.abs(r_m[:, :, :Y] - r0).max()),
      "pad inf ok:", bool(np.isinf(r_m[:, :, Y:]).all()), flush=True)

# anchor: fold at the same moment in time
from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows_shared, sort_rows_alternating

s_probe = jnp.asarray(rng.normal(0, 1, (B, 448, 256)).astype(np.float32))
ss = sort_rows_alternating(s_probe)
ss.block_until_ready()
timed("ANCHOR sort 448 rows", lambda: sort_rows_alternating(s_probe))
timed("ANCHOR fold (tile16, B=512)", lambda: merged_window_rows_shared(ss, 31, 365, out_width=4864, ymax=150))
