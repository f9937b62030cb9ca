"""OTC and dOTC — (dynamical) Optimal Transport Correction (Robin 2021).

Reference: ``adjustment.py:1394-1715``, ``_adjustment.py:1236-1680``.
The method is inherently host-orchestrated (data-dependent histogram supports
and an exact network solver), as in the reference, which delegates to the C++
POT package; here the exact solver is the in-tree C++ ``native.emd`` and a
TPU Sinkhorn path is available via ``solver="sinkhorn"``.
"""

from __future__ import annotations

import numpy as np

from ..ops.ot import bin_width_estimator, eps_cholesky, histogram, optimal_transport
from ..utils.container import DataArray
from ..utils.grouper import Grouper
from ..utils.rng import next_key
from .base import Adjust

__all__ = ["OTC", "dOTC"]


def _np_rng():
    import jax

    seed = int(jax.random.randint(next_key(), (), 0, 2**31 - 1))
    return np.random.default_rng(seed)


def _prepare_bins(bin_width, bin_origin, arrays, nvar, vnames):
    if isinstance(bin_width, dict):
        bw = bin_width_estimator(arrays)
        for k, v in bin_width.items():
            bw[vnames.index(k) if isinstance(k, str) else k] = v
    elif bin_width is None:
        bw = bin_width_estimator(arrays)
    elif np.isscalar(bin_width):
        bw = np.ones(nvar) * bin_width
    else:
        bw = np.asarray(bin_width)
    if isinstance(bin_origin, dict):
        bo = np.zeros(nvar)
        for k, v in bin_origin.items():
            bo[vnames.index(k) if isinstance(k, str) else k] = v
    elif bin_origin is None:
        bo = np.zeros(nvar)
    elif np.isscalar(bin_origin):
        bo = np.ones(nvar) * bin_origin
    else:
        bo = np.asarray(bin_origin)
    return bw, bo


def _otc_core(X, Y, bin_width, bin_origin, num_iter_max, jitter_inside_bins, normalization, solver, rng):
    """Reference ``_otc_adjust`` (``_adjustment.py:1236-1341``) on [P, V]."""
    X_og = X.copy()
    mask = (~np.isnan(X)).all(axis=1)
    X = X[mask]
    Y = Y[(~np.isnan(Y)).all(axis=1)]
    if len(X) == 0 or len(Y) == 0:
        return np.full_like(X_og, np.nan)
    if bin_width is None:
        # reference _otc_adjust re-estimates per call when not specified
        bin_width = bin_width_estimator([Y, X])
    if bin_origin is None:
        bin_origin = np.zeros(X.shape[1])

    gridX, muX, binX = histogram(X, bin_width, bin_origin)
    gridY, muY, _ = histogram(Y, bin_width, bin_origin)
    plan = optimal_transport(gridX, gridY, muX, muY, num_iter_max, normalization, solver)

    gridY_i = np.floor((gridY - bin_origin) / bin_width)

    # group points by their source bin, draw a target bin per point from the
    # plan row (reference _adjustment.py:1318-1334)
    binX_sort = np.lexsort(binX[:, ::-1].T)
    sorted_bins = binX[binX_sort]
    _, binX_start, binX_count = np.unique(sorted_bins, return_index=True, return_counts=True, axis=0)
    binX_groups = np.split(binX_sort, np.sort(binX_start)[1:])

    out = np.empty(X.shape)
    for i, grp in enumerate(binX_groups):
        choice = rng.choice(muY.size, p=plan[i, :], size=len(grp))
        out[grp] = (gridY_i[choice] + 0.5) * bin_width + bin_origin

    if jitter_inside_bins:
        out += rng.uniform(low=-bin_width / 2, high=bin_width / 2, size=out.shape)

    Z = X_og
    Z[mask] = out
    Z[~mask] = np.nan
    return Z


def _dotc_core(X1, Y0, X0, bin_width, bin_origin, num_iter_max, cov_factor, jitter_inside_bins, kind, normalization, solver, rng):
    """Reference ``_dotc_adjust`` (``_adjustment.py:1428-1563``)."""
    X1_og = X1.copy()
    mask = ~np.isnan(X1).any(axis=1)
    X1 = X1[mask]
    X0 = X0[~np.isnan(X0).any(axis=1)]
    Y0 = Y0[~np.isnan(Y0).any(axis=1)]

    args = (bin_width, bin_origin, num_iter_max)
    yX0 = _otc_core(Y0, X0, *args, False, normalization, solver, rng)
    yX1 = _otc_core(yX0, X1, *args, False, normalization, solver, rng)

    motion = np.empty(yX0.shape)
    for j in range(yX0.shape[1]):
        if kind is not None and j in kind and kind[j] == "*":
            motion[:, j] = yX1[:, j] / yX0[:, j]
        else:
            motion[:, j] = yX1[:, j] - yX0[:, j]

    if cov_factor == "cholesky":
        fact0 = eps_cholesky(np.cov(Y0, rowvar=False))
        fact1 = eps_cholesky(np.cov(X0, rowvar=False))
        motion = (fact0 @ np.linalg.inv(fact1) @ motion.T).T
    elif cov_factor == "std":
        motion = motion @ np.diag(np.std(Y0, axis=0) / np.std(X0, axis=0))

    Y1 = np.empty(yX0.shape)
    for j in range(yX0.shape[1]):
        if kind is not None and j in kind and kind[j] == "*":
            Y1[:, j] = Y0[:, j] * motion[:, j]
        else:
            Y1[:, j] = Y0[:, j] + motion[:, j]

    out = _otc_core(X1, Y1, *args, jitter_inside_bins, normalization, solver, rng)
    Z1 = X1_og
    Z1[mask] = out
    Z1[~mask] = np.nan
    return Z1


def _grouped_PV(da: DataArray, gi, pts_dim: str):
    """[V-first stacked array] -> list of [P_g, V] matrices per group
    (P = windowed member count, NaN rows at window pads)."""
    dac = da.move_dim_last("time")
    ax = dac.dims.index(pts_dim)
    arr = np.moveaxis(np.asarray(dac.data), ax, 0)  # [V, T]
    out = []
    for g in range(gi.n_groups):
        idx = gi.gather_idx[g]
        vals = np.where(idx[None, :] >= 0, arr[:, np.clip(idx, 0, arr.shape[-1] - 1)], np.nan)
        out.append(vals.T)  # [P, V]
    return out


class OTC(Adjust):
    r"""Optimal Transport Correction (Robin et al. 2021; reference
    adjustment.py:1394-1589).

    One-shot multivariate mapping of hist onto ref through the optimal
    transport plan between their histograms.  ``sim`` must be None (the
    adjusted series is the hist period).
    """

    _allow_diff_time_sizes = True

    @classmethod
    def _adjust(
        cls,
        ref: DataArray,
        hist: DataArray,
        sim: DataArray,
        *,
        bin_width=None,
        bin_origin=None,
        num_iter_max: int = 100_000_000,
        jitter_inside_bins: bool = True,
        adapt_freq_thresh: dict | None = None,
        normalization: str = "max_distance",
        group: str | Grouper = "time",
        pts_dim: str = "multivar",
        solver: str = "emd",
    ):
        if not sim.attrs.pop("_is_hist", False):
            raise ValueError("OTC does not take a `sim` argument, the hist period is adjusted.")
        group = Grouper(group) if isinstance(group, str) else group
        vnames = [str(v) for v in np.asarray(ref.coords[pts_dim])]
        hist = _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames)

        gi_h = group.indexes(hist.time)
        gi_r = group.indexes(ref.time)
        ref_blocks = _grouped_PV(ref, gi_r, pts_dim)
        hist_blocks = _grouped_PV(hist, gi_h, pts_dim)

        rng = _np_rng()
        histc = hist.move_dim_last("time")
        ax = histc.dims.index(pts_dim)
        out = np.full(np.moveaxis(np.asarray(histc.data), ax, 0).shape, np.nan)  # [V, T]
        for g in range(gi_h.n_groups):
            X = hist_blocks[g]
            Y = ref_blocks[g]
            if bin_width is None and bin_origin is None:
                bw = bo = None
            else:
                arrays = [Y[~np.isnan(Y).any(1)], X[~np.isnan(X).any(1)]]
                bw, bo = _prepare_bins(bin_width, bin_origin, arrays, len(vnames), vnames)
            Z = _otc_core(X, Y, bw, bo, num_iter_max, jitter_inside_bins, normalization, solver, rng)
            # write back window centers
            members = np.flatnonzero(gi_h.group_idx == g)
            slots = gi_h.scatter_slot[members]
            out[:, members] = Z[slots].T

        res = DataArray(np.moveaxis(out, 0, ax), histc.dims, dict(histc.coords), dict(hist.attrs), "scen")
        if histc.dims != hist.dims:
            res = res.transpose(*hist.dims)
        return res


class dOTC(Adjust):
    r"""Dynamical OTC (reference adjustment.py:1591-1715): transports the
    hist->sim evolution onto ref, preserving the simulated change."""

    _allow_diff_time_sizes = True

    @classmethod
    def _adjust(
        cls,
        ref: DataArray,
        hist: DataArray,
        sim: DataArray,
        *,
        bin_width=None,
        bin_origin=None,
        num_iter_max: int = 100_000_000,
        cov_factor: str = "std",
        jitter_inside_bins: bool = True,
        kind: dict | None = None,
        adapt_freq_thresh: dict | None = None,
        normalization: str = "max_distance",
        group: str | Grouper = "time",
        pts_dim: str = "multivar",
        solver: str = "emd",
    ):
        group = Grouper(group) if isinstance(group, str) else group
        vnames = [str(v) for v in np.asarray(ref.coords[pts_dim])]
        hist = _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames)
        kind_idx = {vnames.index(k) if isinstance(k, str) else k: v for k, v in (kind or {}).items()} or None

        gi_r = group.indexes(ref.time)
        gi_h = group.indexes(hist.time)
        gi_s = group.indexes(sim.time)
        ref_blocks = _grouped_PV(ref, gi_r, pts_dim)
        hist_blocks = _grouped_PV(hist, gi_h, pts_dim)
        sim_blocks = _grouped_PV(sim, gi_s, pts_dim)

        rng = _np_rng()
        simc = sim.move_dim_last("time")
        ax = simc.dims.index(pts_dim)
        out = np.full(np.moveaxis(np.asarray(simc.data), ax, 0).shape, np.nan)
        for g in range(gi_s.n_groups):
            X1, Y0, X0 = sim_blocks[g], ref_blocks[g], hist_blocks[g]
            if bin_width is None and bin_origin is None:
                bw = bo = None
            else:
                arrays = [a[~np.isnan(a).any(1)] for a in (Y0, X0, X1)]
                bw, bo = _prepare_bins(bin_width, bin_origin, arrays, len(vnames), vnames)
            Z = _dotc_core(X1, Y0, X0, bw, bo, num_iter_max, cov_factor, jitter_inside_bins, kind_idx, normalization, solver, rng)
            members = np.flatnonzero(gi_s.group_idx == g)
            slots = gi_s.scatter_slot[members]
            out[:, members] = Z[slots].T

        res = DataArray(np.moveaxis(out, 0, ax), simc.dims, dict(simc.coords), dict(sim.attrs), "scen")
        if simc.dims != sim.dims:
            res = res.transpose(*sim.dims)
        return res


def _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames):
    """Per-variable frequency adaptation of hist (reference
    _adjustment.py:1390-1394)."""
    if not adapt_freq_thresh:
        return hist
    import jax.numpy as jnp

    from ..ops.segment import gather_groups, scatter_back
    from ..processing import _adapt_freq_grouped
    from ..utils.units import convert_units_to, str2quantity

    gi = group.indexes(hist.time)
    histc = hist.move_dim_last("time")
    ax = histc.dims.index(pts_dim)
    arr = np.moveaxis(np.asarray(histc.data), ax, 0).copy()
    refc = ref.move_dim_last("time")
    refarr = np.moveaxis(np.asarray(refc.data), refc.dims.index(pts_dim), 0)
    var_attrs = hist.attrs.get("_variable_attrs", {})
    for var, thresh in adapt_freq_thresh.items():
        iv = vnames.index(var)
        units = var_attrs.get(var, {}).get("units", "")
        th = str2quantity(thresh).to(units).magnitude if units else str2quantity(thresh).magnitude
        refg = gather_groups(jnp.asarray(refarr[iv]), gi.gather_idx)
        histg = gather_groups(jnp.asarray(arr[iv]), gi.gather_idx)
        ad, *_ = _adapt_freq_grouped(refg, histg, th)
        arr[iv] = np.asarray(scatter_back(ad, gi.group_idx, gi.scatter_slot))
    out = hist.copy(data=np.moveaxis(arr, 0, ax))
    return out
