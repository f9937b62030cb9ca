"""Break down windowed_group_quantile cost on TPU: prep / kernel / extract."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

R = {}


def log(k, v):
    R[k] = v
    print(f"[p3] {k}: {v}", flush=True)
    json.dump(R, open("/tmp/probe3.json", "w"), indent=1)


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

    def timed(f, arg, n=6):
        out = f(arg)
        float(jnp.nansum(out if not isinstance(out, tuple) else out[0]))
        t0 = time.perf_counter()
        a = arg
        for _ in range(n):
            out = f(a)
            o0 = out if not isinstance(out, tuple) else out[0]
            a = arg + 0 * o0.ravel()[0].astype(arg.dtype)
        float(jnp.nansum(o0))
        return (time.perf_counter() - t0) / n

    # (a) prep: w1 gather + sort + pad + alternate + embed
    @jax.jit
    def prep(xx):
        S, V = _sorted_w1_lists(xx, w1)
        S = jnp.pad(S, ((0, 0), (0, 0), (0, plan.ypad - S.shape[-1])), constant_values=jnp.inf)
        Sp = jnp.full((B, plan.dp, plan.ypad), jnp.inf, dtype=S.dtype)
        Sp = jax.lax.dynamic_update_slice_in_dim(Sp, S, plan.half, axis=1)
        return alternate_row_directions(Sp, axis_rows=-2)

    log("prep_s", round(timed(prep, x), 4))
    Sp = prep(x)

    # (b) kernel alone, tile_b variants
    for tb in (8, 16):
        try:
            f = lambda s: merged_window_rows(s, W, G, tile_b=tb)  # noqa: E731
            log(f"kernel_tile{tb}_s", round(timed(f, Sp), 4))
        except Exception as e:  # noqa: BLE001
            log(f"kernel_tile{tb}_error", str(e)[:200])

    merged = merged_window_rows(Sp, W, G)

    # (c) extraction alone
    q = jnp.asarray(np.linspace(0.01, 0.99, nq, dtype=np.float32))

    @jax.jit
    def extract(m):
        nv = jnp.full((B, G), 150 * 31, jnp.int32)
        return _quantile_on_sorted(m, nv, q, 1.0, 1.0, sentinel="inf")

    log("extract_s", round(timed(extract, merged), 4))

    log("done", True)


if __name__ == "__main__":
    main()
