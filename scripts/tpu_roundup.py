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

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time() - t0:.1f}s)", flush=True)
    print(f"trivial: {float(jnp.sum(jnp.arange(8.0) * 2))} ({time.time() - t0:.1f}s)", flush=True)

    from profile_fused_fold import main as fold_main

    print("--- fused fold profile ---", flush=True)
    fold_main()

    print("--- bench ---", flush=True)
    import bench

    bench.main()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    main()
