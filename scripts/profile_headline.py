"""In-program bisect of the HEADLINE step (QDM monthly, 512 sites x 150 yr).

Times compiled prefixes of qdm_train_adjust_core within one dependent chain
(relay latency amortized over n reps):
  stage 1: gather ref+hist group matrices
  stage 2: + both nan_quantile sorts + factors   (train)
  stage 3: + grouped pct rank of sim             (adjust ranks)
  stage 4: + table lookup + correction           (full step)

Marginal(k) = t[k] - t[k-1] measured WITHIN one jit program each, so XLA
fusion across the kept prefix is real.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _example_problem
    from xsdba_tpu.models._algos import _gather, qdm_adjust_core
    from xsdba_tpu.ops.correction import get_correction
    from xsdba_tpu.ops.quantile import nan_quantile
    from xsdba_tpu.ops.segment import grouped_rank

    args = _example_problem(n_sites=512, n_years=150)
    ref, hist, sim, gather_idx, group_idx, scatter_slot, brackets, q = args
    for a in (ref, hist, sim):
        a.block_until_ready()
    _ = float(jnp.nansum(jnp.arange(8.0)))

    @partial(jax.jit, static_argnames=("stage",))
    def upto(ref, hist, sim, stage: int):
        refg = _gather(ref, gather_idx)
        histg = _gather(hist, gather_idx)
        if stage == 1:
            return jnp.nansum(refg) + jnp.nansum(histg)
        ref_q = nan_quantile(refg, q, axis=-1)
        hist_q = nan_quantile(histg, q, axis=-1)
        af = get_correction(hist_q, ref_q, "+")
        if stage == 2:
            return jnp.nansum(af)
        sim_q = grouped_rank(sim, gather_idx, group_idx, scatter_slot, pct=True)
        if stage == 3:
            return jnp.nansum(af) + jnp.nansum(sim_q)
        scen, _ = qdm_adjust_core.__wrapped__(
            sim, af, q, brackets, gather_idx, group_idx, scatter_slot,
            kind="+", interp="linear", extrapolation="constant",
        )
        return jnp.nansum(scen)

    def timed(f, n=6):
        s = f()
        float(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = f() + 0 * s
        float(s)
        return (time.perf_counter() - t0) / n

    for rep in range(2):
        base = 0.0
        for stage in range(1, 5):
            dt = timed(lambda: upto(ref, hist, sim, stage))
            print(
                f"rep{rep} stage{stage}: {dt*1000:8.1f} ms   (marginal {1000*(dt-base):+8.1f})",
                flush=True,
            )
            base = dt


if __name__ == "__main__":
    main()
