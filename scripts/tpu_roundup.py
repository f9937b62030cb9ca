"""One-process TPU measurement roundup (one device claim, all experiments).

Through the relay, each python process pays a fresh claim + compile-service
round; batching experiments into one process amortizes it (and a killed
process can wedge the lease ~30 min — fewer processes, fewer risks).

Order: trivial-op probe (prints when the device responds), fused-fold vs
per-class profile, then the full bench.py rows.  Everything prints
incrementally so a timeout still records partial results.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache from the first section on (bench.main() also
    # sets it, but the A/B sections run first and their compiles dominate)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time() - t0:.1f}s)", flush=True)
    print(f"trivial: {float(jnp.sum(jnp.arange(8.0) * 2))} ({time.time() - t0:.1f}s)", flush=True)

    import gc
    import traceback

    def cleanup():
        # a section that OOMs (or just finished) must not poison the next:
        # drop cached executables AND collect dead device buffers before the
        # next section allocates
        jax.clear_caches()
        gc.collect()

    # decision-critical measurement FIRST (a later-section OOM can't block it)
    print("--- heavy bench A/B (per-class vs fused fold, end to end) ---", flush=True)
    import bench
    from xsdba_tpu import set_options

    with set_options(fuse_fold_classes=False):
        h0, _ = bench._bench_heavy_doy31(jax, jnp)
    print(f"heavy per-class fold: {h0} gp-yr/s ({h0 / 324000:.3f}x)", flush=True)
    cleanup()
    try:
        with set_options(fuse_fold_classes=True):
            h1, _ = bench._bench_heavy_doy31(jax, jnp)
        print(f"heavy fused fold    : {h1} gp-yr/s ({h1 / 324000:.3f}x)", flush=True)
    except Exception:
        traceback.print_exc()
        h1 = 0.0
    set_options(fuse_fold_classes=h1 > h0)  # leave the winner on for bench
    cleanup()

    print("--- fused fold profile ---", flush=True)
    try:
        from profile_fused_fold import main as fold_main

        fold_main()
    except Exception:
        # a fused-variant Mosaic failure must not block the bench rows
        traceback.print_exc()
    cleanup()

    print("--- bench ---", flush=True)
    bench.main()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    main()
