"""Marginal breakdown of the new windowed quantile flow."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xsdba_tpu.ops.pallas.merge_kernel import (
        merged_window_rows,
        sort_rows_alternating,
    )
    from xsdba_tpu.ops.quantile import _quantile_on_sorted, windowed_group_quantile
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    B, years, W, nq = 128, 150, 31, 50
    t = date_range("1950-01-01", periods=365 * years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=W).indexes(t)
    plan = gi.merge_plan
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(10, 2, (B, len(t))).astype(np.float32))
    w1 = jnp.asarray(plan.w1_gather)
    G = plan.w1_gather.shape[0]
    q = jnp.asarray(np.linspace(0.01, 0.99, nq, dtype=np.float32))
    out_width = -(-(W * plan.w1_gather.shape[1]) // 128) * 128

    def embed(xx):
        vals = xx[..., jnp.clip(w1, 0, xx.shape[-1] - 1)]
        vals = jnp.where(w1 < 0, jnp.nan, vals)
        raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
        raw = jnp.pad(raw, ((0, 0), (0, 0), (0, plan.ypad - raw.shape[-1])), constant_values=jnp.inf)
        Sp = jnp.full((B, plan.dp, plan.ypad), jnp.inf, dtype=raw.dtype)
        return jax.lax.dynamic_update_slice_in_dim(Sp, raw, plan.half, axis=1)

    @jax.jit
    def p0(xx):
        Sp = embed(xx)
        return jnp.nansum(jnp.where(jnp.isinf(Sp), 0, Sp))

    @jax.jit
    def p1(xx):
        Sb = sort_rows_alternating(embed(xx))
        return jnp.nansum(jnp.where(jnp.isinf(Sb), 0, Sb))

    @jax.jit
    def p2(xx):
        Sb = sort_rows_alternating(embed(xx))
        m = merged_window_rows(Sb, W, G, out_width=out_width)
        return jnp.nansum(jnp.where(jnp.isinf(m), 0, m))

    @jax.jit
    def p3(xx):
        Sb = sort_rows_alternating(embed(xx))
        m = merged_window_rows(Sb, W, G, out_width=out_width)
        nv = jnp.full((B, G), 150 * 31, jnp.int32)
        return jnp.nansum(_quantile_on_sorted(m, nv, q, 1.0, 1.0, sentinel="inf"))

    def pw(xx):
        return jnp.nansum(windowed_group_quantile(xx, plan, q))

    def timed(f, n=8):
        float(f(x))
        t0 = time.perf_counter()
        a = x
        acc = None
        for _ in range(n):
            acc = f(a)
            a = x + 0 * acc
        float(acc)
        return (time.perf_counter() - t0) / n

    t0_ = timed(p0)
    t1 = timed(p1)
    t2 = timed(p2)
    t3 = timed(p3)
    tw = timed(pw)
    print(f"[p5] embed only:     {t0_:.4f}", flush=True)
    print(f"[p5] + sortkernel:   {t1:.4f}  (sort ~ {t1 - t0_:.4f})", flush=True)
    print(f"[p5] + merge:        {t2:.4f}  (merge ~ {t2 - t1:.4f})", flush=True)
    print(f"[p5] + extract:      {t3:.4f}  (extract ~ {t3 - t2:.4f})", flush=True)
    print(f"[p5] whole public:   {tw:.4f}", flush=True)


if __name__ == "__main__":
    main()
