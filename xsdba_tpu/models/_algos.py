"""Jitted compute cores for the adjustment schemes.

Each core is a pure function over dense device arrays (time last) plus static
group-index arrays — the TPU equivalent of the reference's decorated compute
functions (``_adjustment.py``).  Cores are jitted once per (scheme, kind,
interp, extrapolation, shapes) signature; everything inside fuses under XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.correction import apply_correction, broadcast_group_factors, get_correction
from ..ops.interp import interp1d_table, interp_on_quantiles_grouped
from ..ops.quantile import grouped_nan_quantile
from ..ops.segment import grouped_rank

__all__ = [
    "eqm_train_core",
    "qdm_adjust_core",
    "qm_adjust_core",
    "scaling_adjust_core",
    "scaling_train_core",
]


@partial(jax.jit, static_argnames=("kind",))
def eqm_train_core(refg, histg, quantiles, *, kind: str):
    """EQM train on one batch: per-group quantiles of ref & hist, correction
    factors (reference ``_adjustment.py:193-286``).

    refg/histg: [..., G, L] gathered group matrices (NaN padded);
    quantiles: [nq].  Returns (af, hist_q): [..., G, nq].
    """
    from ..ops.quantile import nan_quantile

    ref_q = nan_quantile(refg, quantiles, axis=-1)
    hist_q = nan_quantile(histg, quantiles, axis=-1)
    af = get_correction(hist_q, ref_q, kind)
    return af, hist_q


@partial(jax.jit, static_argnames=("kind", "interp", "extrapolation"))
def qm_adjust_core(
    sim,
    hist_q,
    af,
    frac_idx,
    positions,
    *,
    kind: str,
    interp: str,
    extrapolation: str,
):
    """QM adjust (reference ``_adjustment.py:594-676``): look up each sim value
    in the per-group (hist_q -> af) table, apply the correction."""
    G = hist_q.shape[-2]
    if G == 1:
        af_t = interp1d_table(sim, hist_q[..., 0, :], af[..., 0, :], interp, extrapolation)
    else:
        af_t = interp_on_quantiles_grouped(sim, frac_idx, hist_q, af, positions, interp, extrapolation)
    return apply_correction(sim, af_t, kind)


@partial(jax.jit, static_argnames=("kind", "interp", "extrapolation"))
def qdm_adjust_core(
    sim,
    af,
    quantiles,
    frac_idx,
    positions,
    gather_sim,
    group_idx,
    scatter_slot,
    *,
    kind: str,
    interp: str,
    extrapolation: str,
):
    """QDM adjust (reference ``_adjustment.py:783-886``): per-group pct rank of
    sim, then af looked up at (rank, group) and applied.

    Returns (scen, sim_q)."""
    sim_q = grouped_rank(sim, gather_sim, group_idx, scatter_slot, pct=True)
    G = af.shape[-2]
    nq = af.shape[-1]
    qtab = jnp.broadcast_to(quantiles, af.shape[:-2] + (G, nq))
    if G == 1:
        af_t = interp1d_table(sim_q, qtab[..., 0, :], af[..., 0, :], interp, extrapolation)
    else:
        af_t = interp_on_quantiles_grouped(sim_q, frac_idx, qtab, af, positions, interp, extrapolation)
    return apply_correction(sim, af_t, kind), sim_q


@partial(jax.jit, static_argnames=("kind",))
def scaling_train_core(ref, hist, gather_ref, gather_hist, *, kind: str):
    """Scaling train (reference ``_adjustment.py:938-958``): group means."""
    mu_ref = jnp.nanmean(_gather(ref, gather_ref), axis=-1)
    mu_hist = jnp.nanmean(_gather(hist, gather_hist), axis=-1)
    return get_correction(mu_hist, mu_ref, kind)


@partial(jax.jit, static_argnames=("kind", "interp"))
def scaling_adjust_core(sim, af, frac_idx, group_idx, positions, *, kind: str, interp: str):
    """Scaling adjust (reference ``_adjustment.py:961-974``)."""
    af_t = broadcast_group_factors(af, frac_idx, group_idx, positions, interp)
    return apply_correction(sim, af_t, kind)


def _gather(x, gather_idx):
    gi = jnp.asarray(gather_idx)
    vals = x[..., jnp.clip(gi, 0, x.shape[-1] - 1)]
    return jnp.where(gi < 0, jnp.nan, vals)


@partial(jax.jit, static_argnames=("kind", "interp", "extrapolation"))
def qdm_train_adjust_core(
    ref,
    hist,
    sim,
    gather_idx,
    group_idx,
    scatter_slot,
    frac_idx,
    positions,
    quantiles,
    *,
    kind: str,
    interp: str,
    extrapolation: str,
):
    """Fully fused QDM train + adjust — the flagship single-step kernel.

    One jit: grouped quantile estimation of ref & hist (gather->sort->lerp),
    adjustment factors, per-group pct ranks of sim, factor lookup, correction.
    Purely batch-parallel over leading dims -> shards over a site mesh with
    zero collectives.
    """
    from ..ops.quantile import nan_quantile

    refg = _gather(ref, gather_idx)
    histg = _gather(hist, gather_idx)
    ref_q = nan_quantile(refg, quantiles, axis=-1)
    hist_q = nan_quantile(histg, quantiles, axis=-1)
    af = get_correction(hist_q, ref_q, kind)
    scen, _ = qdm_adjust_core.__wrapped__(
        sim,
        af,
        quantiles,
        frac_idx,
        positions,
        gather_idx,
        group_idx,
        scatter_slot,
        kind=kind,
        interp=interp,
        extrapolation=extrapolation,
    )
    return scen
