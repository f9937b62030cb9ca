"""Marginal-cost breakdown: nested pipelines, all chained via the small x."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xsdba_tpu.ops.pallas.merge_kernel import (
        alternate_row_directions,
        merged_window_rows,
    )
    from xsdba_tpu.ops.quantile import _quantile_on_sorted, _sorted_w1_lists
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

    def prep(xx):
        S, V = _sorted_w1_lists(xx, w1)
        S = jnp.pad(S, ((0, 0), (0, 0), (0, plan.ypad - S.shape[-1])), constant_values=jnp.inf)
        Sp = jnp.full((B, plan.dp, plan.ypad), jnp.inf, dtype=S.dtype)
        Sp = jax.lax.dynamic_update_slice_in_dim(Sp, S, plan.half, axis=1)
        return alternate_row_directions(Sp, axis_rows=-2), V

    @jax.jit
    def p1(xx):
        Sp, V = prep(xx)
        return jnp.nansum(jnp.where(jnp.isinf(Sp), 0, Sp))

    @jax.jit
    def p2(xx):
        Sp, V = prep(xx)
        m = merged_window_rows(Sp, W, G)
        return jnp.nansum(jnp.where(jnp.isinf(m), 0, m))

    @jax.jit
    def p3(xx):
        Sp, V = prep(xx)
        m = merged_window_rows(Sp, W, G)
        nv = jnp.full((B, G), 150 * 31, jnp.int32)
        out = _quantile_on_sorted(m, nv, q, 1.0, 1.0, sentinel="inf")
        return jnp.nansum(out)

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

    t1 = timed(p1)
    t2 = timed(p2)
    t3 = timed(p3)
    print(f"[p4] prep only:        {t1:.4f}s", flush=True)
    print(f"[p4] prep+kernel:      {t2:.4f}s  (kernel ~ {t2 - t1:.4f})", flush=True)
    print(f"[p4] prep+kern+extract:{t3:.4f}s  (extract ~ {t3 - t2:.4f})", flush=True)


if __name__ == "__main__":
    main()
