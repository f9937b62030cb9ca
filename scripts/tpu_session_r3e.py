"""Round-3e TPU session: fused heavy step — chained-dispatch timing vs the
in-scan bench, and the EXTRACT_FLAT A/B on the same methodology.

Background: the heavy stage bisect (separate chained dispatches) sums to
~199 ms while the in-scan bench implies ~291 ms/step.  Chained dependent
dispatches with a single final fetch ARE the production regime (the full-
scale protocol runs dispatch-per-block), and enqueueing is async, so only
the last fetch pays relay latency.  If the step itself times ~200 ms here,
the in-scan wrapper (scan carry copies / lost buffer donation) is the
overhead, not the step.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time() - t0:.1f}s)", flush=True)
    print(f"trivial: {float(jnp.sum(jnp.arange(8.0) * 2))} ({time.time() - t0:.1f}s)", flush=True)

    import gc
    import traceback

    from xsdba_tpu.models._algos import eqm_train_adjust_windowed
    from xsdba_tpu.models._wrap import device_brackets
    from xsdba_tpu.ops import quantile as qmod
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
    for a in (ref, hist, sim):
        a.block_until_ready()

    def one():
        scen, af, hq = eqm_train_adjust_windowed(
            ref, hist, sim, gi.merge_plan, q, brackets,
            kind="+", interp="linear", extrapolation="constant", assume_finite=True,
        )
        return jnp.nansum(scen)

    def chained(n):
        s = one()
        float(s)  # warm/compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                s = one() + 0 * s
            float(s)
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        return best

    def cleanup():
        jax.clear_caches()
        gc.collect()

    for flat in (False, True):
        try:
            qmod.EXTRACT_FLAT = flat
            t0 = time.time()
            dt6 = chained(6)
            dt12 = chained(12)
            rate = n_sites * n_years / dt12
            print(
                f"EXTRACT_FLAT={flat}: fused step {dt6*1e3:.1f} ms (n=6), "
                f"{dt12*1e3:.1f} ms (n=12) -> {rate:,.0f} gp-yr/s "
                f"({rate/324000:.3f}x)  [wall {time.time()-t0:.0f}s]",
                flush=True,
            )
        except Exception:
            traceback.print_exc()
        cleanup()

    # in-scan comparison with the bench's exact wrapper, strip extraction
    try:
        qmod.EXTRACT_FLAT = False
        import bench

        h = bench._bench_heavy_doy31(jax, jnp)
        print(f"in-scan bench heavy: {h} gp-yr/s ({h/324000:.3f}x)", flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
