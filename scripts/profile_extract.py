"""Hardware shootout: quantile extraction from merged sorted rows.

Variants:
  A. take_along_axis gathers (current _quantile_on_sorted)
  B. one-hot matmul on the MXU (uniform valid counts): selection by
     einsum with Precision.HIGHEST — exact for f32 (bf16x3 is an exact
     decomposition; products with a {0,1} one-hot reconstruct the value).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.quantile import _quantile_on_sorted

B, G, n, nq = 128, 365, 4736, 50
valid_n = 31 * 150  # 4650
rng = np.random.default_rng(0)
m = np.sort(rng.normal(0, 1, (B, G, valid_n)).astype(np.float32), axis=-1)
merged = np.full((B, G, n), np.inf, dtype=np.float32)
merged[..., :valid_n] = m
merged = jnp.asarray(merged)
q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
nv = jnp.full((B, G), valid_n, dtype=jnp.int32)


def timed(f, rounds=6):
    s = jnp.nansum(jnp.asarray(f()))
    float(s)
    t0 = time.perf_counter()
    for _ in range(rounds):
        s = jnp.nansum(jnp.asarray(f())) + 0 * s
    float(s)
    return (time.perf_counter() - t0) / rounds


@jax.jit
def extract_gather(merged, nv, q):
    return _quantile_on_sorted(merged, nv, q, 1.0, 1.0, sentinel="inf")


@jax.jit
def extract_onehot(merged, nv, q):
    # uniform-valid fast path: same virtual index everywhere
    nv0 = nv.reshape(-1)[0].astype(merged.dtype)
    vi = q * (nv0 - 1)
    prev = jnp.floor(vi)
    gamma = (vi - prev).astype(merged.dtype)
    pi = jnp.clip(prev, 0, n - 1).astype(jnp.int32)
    ni = jnp.clip(prev + 1, 0, n - 1).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)[:, None]
    oh_l = (iota == pi[None, :]).astype(merged.dtype)   # [n, nq]
    oh_r = (iota == ni[None, :]).astype(merged.dtype)
    left = jnp.einsum("bgn,nk->bgk", merged, oh_l, precision=jax.lax.Precision.HIGHEST)
    right = jnp.einsum("bgn,nk->bgk", merged, oh_r, precision=jax.lax.Precision.HIGHEST)
    return left + gamma * (right - left)


t_a = timed(lambda: extract_gather(merged, nv, q))
t_b = timed(lambda: extract_onehot(merged, nv, q))

a = np.asarray(extract_gather(merged, nv, q))
b = np.asarray(extract_onehot(merged, nv, q))
print("maxabs diff:", np.nanmax(np.abs(a - b)))
print(f"gather  {t_a*1000:8.1f} ms")
print(f"one-hot {t_b*1000:8.1f} ms")
