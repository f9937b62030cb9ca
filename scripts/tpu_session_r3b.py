"""Round-3b TPU session: heavy-config step-level breakdown in ONE process.

Sections (each prints incrementally; a timeout keeps partial results):
  1. trivial probe (device responsive?)
  2. heavy fused bench anchor (256 sites, the bench.py metric itself)
  3. train-side stage bisect (slab | +sort | +fold | +extract | +factors)
  4. adjust-only rate at the same shape (the step minus train)
  5. full bench.py rows

Together 2-4 give the step-level roofline decomposition for
docs/PERFORMANCE.md: train stages + adjust stage vs the fused step, all
measured within one process so relay drift cannot distort the ratios.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time() - t0:.1f}s)", flush=True)
    print(f"trivial: {float(jnp.sum(jnp.arange(8.0) * 2))} ({time.time() - t0:.1f}s)", flush=True)

    import gc

    import bench

    def cleanup():
        jax.clear_caches()
        gc.collect()

    print("--- heavy fused bench anchor ---", flush=True)
    h1 = bench._bench_heavy_doy31(jax, jnp)
    print(f"heavy fused: {h1} gp-yr/s ({h1 / 324000:.3f}x)", flush=True)
    cleanup()

    print("--- train-side stage bisect ---", flush=True)
    import runpy

    try:
        runpy.run_path("/root/repo/scripts/profile_bisect.py")
    except Exception:
        import traceback

        traceback.print_exc()
    cleanup()

    print("--- adjust-only rate ---", flush=True)
    try:
        from xsdba_tpu.models._algos import eqm_train_windowed, qm_adjust_core
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
        af, hist_q = eqm_train_windowed(ref, hist, gi.merge_plan, q, kind="+")
        af.block_until_ready()

        def step(carry):
            (s,) = carry
            scen = qm_adjust_core(
                s, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant"
            )
            return jnp.nansum(scen)

        rate = bench._inscan_rate(jax, jnp, step, (sim,), n_sites * n_years)
        print(
            f"adjust-only: {rate:.1f} gp-yr/s  -> {n_sites * n_years / rate * 1e3:.1f} ms/step",
            flush=True,
        )
        print(
            f"(heavy fused step was {n_sites * n_years / h1 * 1e3:.1f} ms)",
            flush=True,
        )
    except Exception:
        import traceback

        traceback.print_exc()
    cleanup()

    print("--- bench ---", flush=True)
    bench.main()


if __name__ == "__main__":
    main()
