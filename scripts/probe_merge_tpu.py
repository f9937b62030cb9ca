"""TPU probe: merge-kernel viability + config-1 timings. Run alone on the TPU."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}


def log(k, v):
    RESULTS[k] = v
    print(f"[probe] {k}: {v}", flush=True)
    with open("/tmp/probe1.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def fetch(x):
    import jax.numpy as jnp

    return float(jnp.nansum(x))


def timed(fn, arg, n=6):
    # chain dependent steps; fetch once (relay sync rule)
    t0 = time.perf_counter()
    r = fn(arg)
    f0 = fetch(r)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = arg
    out = None
    for _ in range(n):
        out = fn(a)
        a = a + 0 * out.ravel()[0]
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    return t_first, dt, f0


def main():
    import jax
    import jax.numpy as jnp

    log("backend", jax.default_backend())
    log("platform", jax.devices()[0].platform)

    # 0) trivial pallas kernel through the relay?
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(i_ref, o_ref):
            o_ref[...] = i_ref[...] * 2.0

        x = jnp.ones((8, 128), jnp.float32)
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        log("pallas_smoke", fetch(y))
    except Exception as e:  # noqa: BLE001
        log("pallas_smoke_error", repr(e)[:500])

    B, years, W, nq = 128, 150, 31, 50
    from xsdba_tpu.models._algos import eqm_train_from_raw, eqm_train_windowed
    from xsdba_tpu.ops.quantile import windowed_group_quantile
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("1950-01-01", periods=365 * years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=W).indexes(t)
    log("plan", dict(n_fast=gi.merge_plan.n_fast, ypad=gi.merge_plan.ypad,
                     wpad=gi.merge_plan.wpad, dp=gi.merge_plan.dp))
    rng = np.random.default_rng(0)
    T = len(t)
    ref = jnp.asarray(rng.normal(10, 2, (B, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(12, 3, (B, T)).astype(np.float32))
    q = jnp.asarray(np.linspace(1 / (2 * nq), 1 - 1 / (2 * nq), nq, dtype=np.float32))

    # 1) current amplified sort cost (isolated)
    gidx = jnp.asarray(gi.gather_idx)

    import functools

    @jax.jit
    def amp_sort(x):
        v = jnp.where(gidx < 0, jnp.nan, x[..., jnp.clip(gidx, 0, T - 1)])
        return jnp.sort(v, axis=-1)

    tf, dt, _ = timed(amp_sort, ref, n=3)
    log("amplified_gather_sort_s", dict(first=round(tf, 3), steady=round(dt, 4)))

    # 2) old full train
    old_train = functools.partial(jax.jit(lambda r, h: eqm_train_from_raw(r, h, gidx, q, kind="+")))
    tf, dt, _ = timed(lambda r: old_train(r, hist)[0], ref, n=3)
    log("eqm_train_old_s", dict(first=round(tf, 3), steady=round(dt, 4)))

    # 3) windowed quantile alone (kernel)
    try:
        wq = lambda r: windowed_group_quantile(r, gi.merge_plan, q, use_kernel=True)  # noqa: E731
        tf, dt, _ = timed(wq, ref, n=6)
        log("windowed_quantile_kernel_s", dict(first=round(tf, 3), steady=round(dt, 4)))
    except Exception as e:  # noqa: BLE001
        log("windowed_quantile_kernel_error", repr(e)[:800])

    # 4) new full train + parity vs old
    try:
        new_train = lambda r: eqm_train_windowed(r, hist, gi.merge_plan, q, kind="+")[0]  # noqa: E731
        tf, dt, _ = timed(new_train, ref, n=6)
        log("eqm_train_new_s", dict(first=round(tf, 3), steady=round(dt, 4)))
        af_new = np.asarray(new_train(ref))
        af_old = np.asarray(old_train(ref, hist)[0])
        err = float(np.nanmax(np.abs(af_new - af_old)))
        log("train_parity_maxabs", err)
    except Exception as e:  # noqa: BLE001
        log("eqm_train_new_error", repr(e)[:800])

    log("done", True)


if __name__ == "__main__":
    main()
