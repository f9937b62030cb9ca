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
