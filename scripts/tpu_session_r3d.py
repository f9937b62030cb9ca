"""Round-3d TPU session: extraction A/B + headline bisect (one process).

1. trivial probe
2. heavy bench, strip extraction (today's anchor)
3. heavy bench, flat extraction (EXTRACT_FLAT=True; caches cleared between)
4. headline stage bisect (gather | +train quantiles | +rank | +lookup)
5. full bench rows with the winning extraction
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time() - t0:.1f}s)", flush=True)
    print(f"trivial: {float(jnp.sum(jnp.arange(8.0) * 2))} ({time.time() - t0:.1f}s)", flush=True)

    import gc
    import traceback

    import bench
    from xsdba_tpu.ops import quantile as qmod

    def cleanup():
        jax.clear_caches()
        gc.collect()

    print("--- heavy bench extraction A/B ---", flush=True)
    qmod.EXTRACT_FLAT = False
    h0 = bench._bench_heavy_doy31(jax, jnp)
    print(f"heavy strip extract: {h0} gp-yr/s ({h0 / 324000:.3f}x)", flush=True)
    cleanup()
    try:
        qmod.EXTRACT_FLAT = True
        h1 = bench._bench_heavy_doy31(jax, jnp)
        print(f"heavy flat extract : {h1} gp-yr/s ({h1 / 324000:.3f}x)", flush=True)
    except Exception:
        traceback.print_exc()
        h1 = 0.0
    qmod.EXTRACT_FLAT = h1 > h0
    print(f"EXTRACT_FLAT -> {qmod.EXTRACT_FLAT}", flush=True)
    cleanup()

    print("--- fused heavy step: dependent-dispatch timing (vs in-scan) ---", flush=True)
    # the stage bisect (chained separate dispatches) sums to ~199 ms while
    # the in-scan bench says ~291 ms/step: time the SAME fused step with the
    # bisect's methodology to see whether the gap is the step or the scan
    try:
        import numpy as np

        from xsdba_tpu.models._algos import eqm_train_adjust_windowed
        from xsdba_tpu.models._wrap import device_brackets
        from xsdba_tpu.ops.correction import equally_spaced_nodes
        from xsdba_tpu.utils.calendar import date_range
        from xsdba_tpu.utils.grouper import Grouper

        n_sites, n_years, nq = 256, 150, 50
        t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
        gi = Grouper("time.dayofyear", window=31).indexes(t)
        rng = np.random.default_rng(1)
        T = len(t)
        ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
        hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
        sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
        q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
        brackets = device_brackets(gi, "linear")

        def one():
            scen, af, hq = eqm_train_adjust_windowed(
                ref, hist, sim, gi.merge_plan, q, brackets,
                kind="+", interp="linear", extrapolation="constant", assume_finite=True,
            )
            return jnp.nansum(scen)

        s = one()
        float(s)
        for n in (6, 12):
            t0 = time.time()
            for _ in range(n):
                s = one() + 0 * s
            float(s)
            dt = (time.time() - t0) / n
            print(f"fused step, {n} chained dispatches: {dt*1e3:.1f} ms/step", flush=True)
    except Exception:
        traceback.print_exc()
    cleanup()

    print("--- headline stage bisect ---", flush=True)
    try:
        from profile_headline import main as headline_main

        headline_main()
    except Exception:
        traceback.print_exc()
    cleanup()

    print("--- bench ---", flush=True)
    bench.main()


if __name__ == "__main__":
    main()
