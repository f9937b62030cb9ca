"""Exceedance-cluster extraction with static shapes.

Replaces reference ``utils.py:788-921`` (pad-and-diff run finding + Python
loop): runs of ``x > u2`` are labeled with a cumulative-sum of run starts and
reduced with ``segment_max`` — clusters whose maximum exceeds ``u1`` survive.
Outputs are NaN/-1 padded to the static bound ``T // 2`` (the reference's own
worst case, utils.py:888).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["cluster_fields", "cluster_maxima"]


def _run_ids(exce):
    """1-based run id per position (0 where not exceeding). exce: [..., T]."""
    prev = jnp.concatenate([jnp.zeros_like(exce[..., :1]), exce[..., :-1]], axis=-1)
    starts = exce & ~prev
    return jnp.cumsum(starts, axis=-1) * exce


@partial(jax.jit, static_argnames=("max_clusters",))
def cluster_fields(x, u1, u2, *, max_clusters: int):
    """Full cluster info (reference ``get_clusters_1d``), batched.

    x: [..., T].  Returns dict of [..., C] arrays (C = max_clusters):
    ``start``, ``end``, ``maxpos`` (−1 padded), ``maximum`` (NaN padded),
    and ``nclusters`` [...].  Valid clusters are compacted to the front.
    """
    x = jnp.asarray(x)
    T = x.shape[-1]
    C = max_clusters
    exce = jnp.where(jnp.isnan(x), False, x > u2)
    rid = _run_ids(exce)                      # [..., T], 0..C

    idx = jnp.arange(T)

    def per_row(xr_, rid_, exce_):
        seg = jnp.where(exce_, rid_, C + 1)   # out-of-range bucket for non-runs
        mx = jax.ops.segment_max(jnp.where(exce_, xr_, -jnp.inf), seg, num_segments=C + 2)
        st = jax.ops.segment_min(jnp.where(exce_, idx, T), seg, num_segments=C + 2)
        en = jax.ops.segment_max(jnp.where(exce_, idx, -1), seg, num_segments=C + 2)
        # position of maximum: first index where value == cluster max
        is_max = exce_ & (xr_ == mx[rid_])
        mp = jax.ops.segment_min(jnp.where(is_max, idx, T), seg, num_segments=C + 2)
        return mx[1 : C + 1], st[1 : C + 1], en[1 : C + 1], mp[1 : C + 1]

    fn = per_row
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn)
    mx, st, en, mp = fn(x, rid, exce)

    keep = mx > u1
    # compact kept clusters to the front, preserving order
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    take = lambda a, fill: jnp.where(
        jnp.take_along_axis(keep, order, axis=-1),
        jnp.take_along_axis(a, order, axis=-1),
        fill,
    )
    return {
        "start": take(st, -1).astype(jnp.int32),
        "end": take(en, -1).astype(jnp.int32),
        "maxpos": take(mp, -1).astype(jnp.int32),
        "maximum": take(mx, jnp.nan),
        "nclusters": jnp.sum(keep, axis=-1),
    }


def cluster_maxima(x, u1, u2, *, max_clusters: int):
    """Cluster maxima only: [..., C] NaN-padded, compacted to the front."""
    return cluster_fields(x, u1, u2, max_clusters=max_clusters)["maximum"]
