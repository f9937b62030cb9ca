"""Exceedance-cluster extraction with static shapes.

Replaces reference ``utils.py:788-921`` (pad-and-diff run finding + Python
loop): runs of ``x > u2`` get their run-maximum via segmented scans; runs
whose maximum exceeds ``u1`` are labeled with a cumulative count and reduced
with segment ops.  Because only *qualifying* runs consume a label, the
static bound ``max_clusters`` can be the reference's own over-allocation
``(1-q_thresh)*T*1.05`` (``adjustment.py:856``) instead of T//2 — labels
past the bound are dropped, exactly like the reference's fixed-size output.
Outputs are NaN/-1 padded and compacted to the front in chronological order.
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


def _run_max(x, exce, rid):
    """Maximum of each run, broadcast to every member position (segmented
    scan forward + backward; gaps share id 0 but carry -inf)."""
    vals = jnp.where(exce, x, -jnp.inf)

    def comb(a, b):
        ra, ma = a
        rb, mb = b
        return rb, jnp.where(ra == rb, jnp.maximum(ma, mb), mb)

    ax = x.ndim - 1  # associative_scan's reverse path requires a nonneg axis
    _, fwd = jax.lax.associative_scan(comb, (rid, vals), axis=ax)
    _, bwd = jax.lax.associative_scan(comb, (rid, vals), axis=ax, reverse=True)
    return jnp.maximum(fwd, bwd)


@partial(jax.jit, static_argnames=("max_clusters",))
def cluster_fields(x, u1, u2, *, max_clusters: int):
    """Full cluster info (reference ``get_clusters_1d``), batched.

    x: [..., T].  Returns dict of [..., C] arrays (C = max_clusters):
    ``start``, ``end``, ``maxpos`` (−1 padded), ``maximum`` (NaN padded),
    and ``nclusters`` [...].  Valid clusters (runs of ``x > u2`` containing a
    value ``> u1``) are compacted to the front in chronological order;
    clusters past ``max_clusters`` are dropped.
    """
    x = jnp.asarray(x)
    T = x.shape[-1]
    C = max_clusters
    exce = jnp.where(jnp.isnan(x), False, x > u2)
    rid = _run_ids(exce)
    rmax = _run_max(x, exce, rid)
    qualify = exce & (rmax > u1)
    prev = jnp.concatenate([jnp.zeros_like(exce[..., :1]), exce[..., :-1]], axis=-1)
    qstart = (exce & ~prev) & qualify
    # 1-based id over qualifying runs only
    qid = jnp.cumsum(qstart, axis=-1) * qualify

    idx = jnp.arange(T)

    def per_row(xr_, qid_, member_):
        seg = jnp.where(member_, jnp.minimum(qid_, C + 1), C + 1)
        mx = jax.ops.segment_max(jnp.where(member_, xr_, -jnp.inf), seg, num_segments=C + 2)
        st = jax.ops.segment_min(jnp.where(member_, idx, T), seg, num_segments=C + 2)
        en = jax.ops.segment_max(jnp.where(member_, idx, -1), seg, num_segments=C + 2)
        # position of maximum: first index where value == cluster max
        is_max = member_ & (xr_ == mx[jnp.minimum(qid_, C + 1)])
        mp = jax.ops.segment_min(jnp.where(is_max, idx, T), seg, num_segments=C + 2)
        return mx[1 : C + 1], st[1 : C + 1], en[1 : C + 1], mp[1 : C + 1]

    fn = per_row
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn)
    mx, st, en, mp = fn(x, qid, qualify)

    valid = jnp.isfinite(mx)
    return {
        "start": jnp.where(valid, st, -1).astype(jnp.int32),
        "end": jnp.where(valid, en, -1).astype(jnp.int32),
        "maxpos": jnp.where(valid, mp, -1).astype(jnp.int32),
        "maximum": jnp.where(valid, mx, jnp.nan),
        "nclusters": jnp.sum(qstart, axis=-1),
    }


def cluster_maxima(x, u1, u2, *, max_clusters: int):
    """Cluster maxima only: [..., C] NaN-padded, compacted to the front."""
    return cluster_fields(x, u1, u2, max_clusters=max_clusters)["maximum"]
