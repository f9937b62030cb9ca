"""TPU probe: counting-selection windowed quantile vs the merge cascade.

Runs on the axon TPU (one process). Sections:
  1. correctness at small shape: selection == jitted re-sort oracle, bit-equal
  2. train-quantile-only in-scan rate at the heavy bench shape (B=512 stacked)
  3. full fused train+adjust step A/B: merge backend vs selection backend

Usage: python scripts/probe_selquant.py [Wb ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _inscan_rate
    from xsdba_tpu.ops.correction import equally_spaced_nodes
    from xsdba_tpu.ops.quantile import windowed_group_quantile
    from xsdba_tpu.ops.selquant import (
        _plan_label_device,
        selection_windowed_quantile,
        selection_windowed_quantile_core,
    )
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    wbs = [int(a) for a in sys.argv[1:]] or [32]

    # --- 1. correctness on TPU (bit-equality incl. the label bitcast ride) ---
    print("--- correctness (TPU) ---", flush=True)
    t = date_range("1980-01-01", periods=365 * 6, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=31).indexes(t)
    plan = gi.merge_plan
    q20 = equally_spaced_nodes(20).astype(np.float32)
    rng = np.random.default_rng(0)
    from xsdba_tpu.ops.quantile import grouped_nan_quantile

    oracle_jit = jax.jit(lambda xx, qq: grouped_nan_quantile(xx, gi.gather_idx, qq))
    for tag, x in [
        ("finite", rng.normal(10, 3, (4, len(t))).astype(np.float32)),
        (
            "nan",
            np.where(
                rng.random((4, len(t))) < 0.1, np.nan, rng.normal(10, 3, (4, len(t)))
            ).astype(np.float32),
        ),
    ]:
        xj = jnp.asarray(x)
        sel = np.asarray(selection_windowed_quantile(xj, plan, q20))
        want = np.asarray(oracle_jit(xj, jnp.asarray(q20)))
        ok = np.array_equal(sel, want, equal_nan=True)
        print(f"  {tag}: bit-equal={ok} maxdiff={0 if ok else np.nanmax(np.abs(sel-want))}", flush=True)

    # --- heavy bench shapes ---
    n_sites, n_years, nq = 256, 150, 50
    t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=31).indexes(t)
    plan = gi.merge_plan
    T = len(t)
    q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
    ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
    lab = _plan_label_device(plan)
    G = int(plan.fast_mask.shape[0])

    print("--- 2. train-quantile-only in-scan (B=512 stacked) ---", flush=True)
    for Wb in wbs:
        def step(carry, Wb=Wb):
            r, h = carry
            both = jnp.stack([r, h], axis=0)
            out = selection_windowed_quantile_core(both, lab, q, G=G, Wb=Wb)
            return jnp.nansum(out)

        try:
            rate, spread = _inscan_rate(
                jax, jnp, step, (ref, hist), n_sites * n_years, n_steps=8, reps=3
            )
            print(f"  selection Wb={Wb}: {rate:,.0f} gp-yr/s (spread {spread:.3f})", flush=True)
        except Exception as e:
            print(f"  selection Wb={Wb}: FAILED {str(e)[:200]}", flush=True)

    def step_merge(carry):
        r, h = carry
        both = jnp.stack([r, h], axis=0)
        out = windowed_group_quantile(both, plan, q)
        return jnp.nansum(out)

    rate, spread = _inscan_rate(
        jax, jnp, step_merge, (ref, hist), n_sites * n_years, n_steps=8, reps=3
    )
    print(f"  merge cascade: {rate:,.0f} gp-yr/s (spread {spread:.3f})", flush=True)


if __name__ == "__main__":
    main()
