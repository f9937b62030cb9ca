"""Benchmark: QDM train+adjust throughput (gridpoint-years / second).

North star (BASELINE.md): QDM train+adjust on a 0.25-degree global daily
150-year dataset in < 60 s on a TPU v5e-8 pod — i.e. ~1.04M gridpoints x
150 yr / 60 s / 8 chips ~= 325k gridpoint-years/s/chip.  ``vs_baseline`` is
measured single-chip throughput over that per-chip target (>1 beats it).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# per-chip target implied by the north star: 0.25deg grid = 1440x720 points
_BASELINE_GPYRS_PER_S = 1_036_800 * 150 / 60 / 8  # = 324_000


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_problem
    from xsdba_tpu.models._algos import qdm_train_adjust_core

    n_years = 150
    # pick the site batch so the dominant intermediate (gather matrix
    # [sites, 12, 31*years]) stays within HBM
    n_sites = 512
    args = _example_problem(n_sites=n_sites, n_years=n_years)

    @jax.jit
    def step_sum(ref, *a):
        # scalar summary fused into the step: forcing its transfer to host is
        # the only reliable sync point through the remote-TPU relay
        # (block_until_ready returns early there).
        out = qdm_train_adjust_core.__wrapped__(
            ref, *a, kind="+", interp="linear", extrapolation="constant"
        )
        return jnp.nansum(out)

    ref, rest = args[0], args[1:]

    # compile + first run
    s = float(step_sum(ref, *rest))
    assert np.isfinite(s)

    def timed(n):
        # chain iterations through the data so they can't be elided, fetch once:
        # amortizes the relay's fetch latency out of the per-step time.
        t0 = time.perf_counter()
        r = ref
        acc = None
        for _ in range(n):
            acc = step_sum(r, *rest)
            r = ref + 0 * acc
        float(acc)
        return time.perf_counter() - t0

    t1 = timed(1)
    t9 = timed(9)
    dt = max((t9 - t1) / 8, 1e-9)

    gp_years = n_sites * n_years
    value = gp_years / dt
    print(
        json.dumps(
            {
                "metric": "QDM train+adjust throughput (single chip)",
                "value": round(value, 1),
                "unit": "gridpoint-years/s",
                "vs_baseline": round(value / _BASELINE_GPYRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
