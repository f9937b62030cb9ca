"""Measure the fused all-classes fold vs per-class launches on TPU.

The heavy-config fold stage launches one program per class (16 at window
31); each re-reads the slab + dyadic levels from HBM.  The fused variant
folds every class inside ONE program so those blocks are VMEM-resident once
per batch tile.  This probe times both at the production shape (B=512
stacked ref+hist, G=365, window=31, 150 years) through a scalar-fetch sync
(block_until_ready is unreliable over the relay; see bench.py).

Run on the axon TPU: ``python scripts/profile_fused_fold.py``.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xsdba_tpu.ops.pallas.merge_kernel import (
        alternate_row_directions,
        merged_window_rows_shared,
        sort_rows_alternating,
    )

    B, window, G, Ymax = 512, 31, 365, 150
    m = 256  # lane width after pow2 padding of 150 years
    wpad = 32
    # production out_width (ops/quantile.py): store only rows that can hold
    # valid values — 19 rows at 150 valid years, not the 32-row default.
    # The default over-allocates the [B, G, rows, m] output by ~2 GB and the
    # probe then exhausts the 16 GB HBM (measured: ResourceExhausted).
    out_width = min(wpad * m, -(-(window * Ymax) // m) * m)
    dblock = max(wpad, 32)
    Gx = G + 2 * (window // 2)
    Dp = ((G - 1) // dblock + 2) * dblock
    if Dp < Gx + wpad + 8:
        Dp = ((Gx + wpad + 8 - 1) // dblock + 1) * dblock

    rng = np.random.default_rng(0)
    x = np.full((B, Dp, m), np.inf, dtype=np.float32)
    x[:, :, :Ymax] = rng.normal(10, 3, (B, Dp, Ymax))
    xs = jnp.asarray(x)
    xs = sort_rows_alternating(xs)
    float(jnp.nansum(jnp.where(jnp.isfinite(xs), xs, 0.0)))  # sync upload+sort

    def timed(fuse, tile_b=None):
        def run():
            out = merged_window_rows_shared(
                xs, window, G, ymax=Ymax, fuse_classes=fuse, tile_b=tile_b,
                out_width=out_width,
            )
            return float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))

        t0 = time.perf_counter()
        s = run()  # compile
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return s, t_compile, min(times)

    s0, c0, t0 = timed(False)
    print(f"per-class  : compile {c0:.1f}s  best {t0*1e3:.1f} ms  checksum {s0:.6g}", flush=True)
    s1, c1, t1 = timed(True)
    print(f"fused t16  : compile {c1:.1f}s  best {t1*1e3:.1f} ms  checksum {s1:.6g}", flush=True)
    print(f"match={s0 == s1}  speedup={t0 / t1:.2f}x", flush=True)
    try:
        # the fused program holds classes x out_rows of state per tile —
        # a smaller batch tile may fit VMEM better than the per-class tune
        s2, c2, t2 = timed(True, tile_b=8)
        print(f"fused t8   : compile {c2:.1f}s  best {t2*1e3:.1f} ms  match={s2 == s0}", flush=True)
    except Exception as err:
        print(f"fused t8 failed: {err}", flush=True)


if __name__ == "__main__":
    main()
