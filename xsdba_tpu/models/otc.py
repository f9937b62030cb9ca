"""OTC and dOTC — (dynamical) Optimal Transport Correction (Robin 2021).

Behavioral reference: ``adjustment.py:1394-1715``, ``_adjustment.py:1236-1680``
(histogram both datasets, solve an exact transport plan between the occupied
bins, stochastically send every source point to a target bin drawn from its
bin's plan row, optional in-bin jitter; dOTC additionally transports the
hist→sim evolution onto ref).

This implementation is organized differently from the reference:

- the stochastic bin assignment is a single vectorized inverse-CDF over the
  plan's row CDFs (``_send_points``) instead of a Python loop over occupied
  source bins drawing ``np.random.choice`` per bin;
- all uniforms come from the session JAX PRNG (``utils.rng``), drawn on
  device in padded blocks so repeated group calls reuse compiled shapes;
- the exact plan solves (in-tree C++ ``native.emd``; the reference delegates
  to the POT package) run thread-parallel across groups — each group's
  transport is independent and the solver releases the GIL;
- the dOTC motion/rescale algebra is vectorized over variables with a
  multiplicative-kind mask rather than per-column loops, and the Cholesky
  cov rescale uses triangular solves instead of an explicit inverse.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple

import numpy as np

from ..ops.ot import bin_width_estimator, eps_cholesky, optimal_transport
from ..utils.container import DataArray
from ..utils.grouper import Grouper
from ..utils.rng import next_key
from .base import Adjust

__all__ = ["OTC", "dOTC"]

_MAX_PLAN_THREADS = 8


class _Support(NamedTuple):
    """Occupied-bin histogram support of a point cloud."""

    centers: np.ndarray  # [B, V] lattice centers of the occupied bins
    weights: np.ndarray  # [B] relative frequencies
    cell_of: np.ndarray  # [N] occupied-bin row of each point


def _support(pts: np.ndarray, width: np.ndarray, origin: np.ndarray) -> _Support:
    """Histogram ``pts`` [N, V] over the (width, origin) lattice, keeping only
    occupied cells (reference ``utils.py:1054-1071``) plus the point→cell map
    that the vectorized sampler needs."""
    cells = np.floor((pts - origin) / width)
    occ, cell_of, counts = np.unique(cells, axis=0, return_inverse=True, return_counts=True)
    return _Support((occ + 0.5) * width + origin, counts / counts.sum(), cell_of.ravel())


class _Draws:
    """Uniform variates from the session JAX PRNG.

    Each instance owns one subkey (split on the main thread, so group workers
    never touch the global stream concurrently) and derives per-call subkeys
    from a counter.  Draws happen on device in power-of-two padded blocks to
    bound the number of distinct compiled shapes.
    """

    def __init__(self, key):
        self._key = key
        self._n = 0

    def uniform(self, *shape: int) -> np.ndarray:
        import jax

        self._n += 1
        sub = jax.random.fold_in(self._key, self._n)
        n = int(np.prod(shape)) if shape else 1
        padded = 1 << max(6, (max(n, 1) - 1).bit_length())
        block = np.asarray(jax.random.uniform(sub, (padded,)), dtype=np.float64)
        return block[:n].reshape(shape)


class _BinSpec(NamedTuple):
    """User bin configuration; ``None`` entries are estimated per transport
    from the participating clouds (Freedman-Diaconis, as the reference does
    when ``bin_width`` is not given)."""

    width: np.ndarray | None
    origin: np.ndarray | None

    def resolve(self, clouds: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        nvar = clouds[0].shape[1]
        width = bin_width_estimator(clouds) if self.width is None else self.width
        origin = np.zeros(nvar) if self.origin is None else self.origin
        return np.broadcast_to(width, (nvar,)).astype(float), np.broadcast_to(origin, (nvar,)).astype(float)

    def fill(self, clouds: list[np.ndarray]) -> "_BinSpec":
        """Estimate the NaN-marked width entries (dict form with unnamed
        variables) from the participating clouds — per group, as the
        reference does (``_adjustment.py:1285-1289`` estimates from that
        call's [Y, X]; dOTC fixes one estimate from [Y0, X0, X1] for its
        three internal transports, ``_adjustment.py:1486-1491``)."""
        if self.width is None or not np.isnan(self.width).any():
            return self
        est = bin_width_estimator(clouds)
        return self._replace(width=np.where(np.isnan(self.width), est, self.width))


def _parse_bin_arg(value, default, nvar: int, vnames: list[str]) -> np.ndarray | None:
    """Lower the public ``bin_width``/``bin_origin`` argument (scalar, array,
    or per-variable dict; reference ``_adjustment.py:1360-1388``) to a [V]
    vector, or None when it must be estimated from the data."""
    if value is None:
        return None
    if isinstance(value, dict):
        out = default.copy()
        for k, v in value.items():
            out[vnames.index(k) if isinstance(k, str) else k] = v
        return out
    if np.isscalar(value):
        return np.full(nvar, float(value))
    return np.asarray(value, dtype=float)


def _send_points(
    X: np.ndarray,
    Y: np.ndarray,
    spec: _BinSpec,
    draws: _Draws,
    *,
    num_iter_max: int,
    normalization: str,
    solver: str,
    jitter: bool,
) -> np.ndarray:
    """Map finite rows of ``X`` [N, V] onto the distribution of ``Y`` [M, V].

    Every source point inherits the plan row of its histogram cell — a
    categorical over target cells — and picks a target by inverting that
    row's CDF at one uniform.  Output is the target cell's lattice center,
    optionally jittered uniformly within the cell.
    """
    width, origin = spec.resolve([Y, X])
    src, tgt = _support(X, width, origin), _support(Y, width, origin)
    plan = optimal_transport(
        src.centers, tgt.centers, src.weights, tgt.weights, num_iter_max, normalization, solver
    )
    row_cdf = np.cumsum(plan, axis=1)[src.cell_of]  # [N, Bt]
    # u in (0, total]: scaling into the row total guards rows not summing
    # exactly to 1, and the open lower bound keeps a u == 0 draw from
    # selecting a zero-probability leading bin
    u = (1.0 - draws.uniform(len(X))) * row_cdf[:, -1]
    picked = np.minimum((row_cdf < u[:, None]).sum(axis=1), row_cdf.shape[1] - 1)
    mapped = tgt.centers[picked]
    if jitter:
        mapped = mapped + (draws.uniform(*mapped.shape) - 0.5) * width
    return mapped


def _finite_rows(a: np.ndarray) -> np.ndarray:
    return np.isfinite(a).all(axis=1)


def _otc_group(X, Y, spec, draws, *, num_iter_max, normalization, solver, jitter) -> np.ndarray:
    """One group's OTC: transport hist points ``X`` onto ref ``Y``, preserving
    NaN rows (window pads / missing data) in place."""
    keep_x, keep_y = _finite_rows(X), _finite_rows(Y)
    out = np.full_like(X, np.nan)
    if keep_x.any() and keep_y.any():
        out[keep_x] = _send_points(
            X[keep_x], Y[keep_y], spec.fill([Y[keep_y], X[keep_x]]), draws,
            num_iter_max=num_iter_max, normalization=normalization, solver=solver, jitter=jitter,
        )
    return out


def _dotc_group(
    X1, Y0, X0, spec, draws, *, num_iter_max, cov_factor, jitter, mult_mask, normalization, solver
) -> np.ndarray:
    """One group's dOTC (reference semantics, restructured).

    Read the simulated evolution at the ref points by pulling them through
    hist then sim; rescale that motion; displace ref by it; finally transport
    the sim points onto the displaced ref.
    """
    keep = _finite_rows(X1)
    sim_f, ref_f, hist_f = X1[keep], Y0[_finite_rows(Y0)], X0[_finite_rows(X0)]
    out = np.full_like(X1, np.nan)
    if not (len(sim_f) and len(ref_f) and len(hist_f)):
        return out

    spec = spec.fill([ref_f, hist_f, sim_f])  # one estimate for all three transports
    common = dict(num_iter_max=num_iter_max, normalization=normalization, solver=solver)
    ref_at_hist = _send_points(ref_f, hist_f, spec, draws, jitter=False, **common)
    ref_at_sim = _send_points(ref_at_hist, sim_f, spec, draws, jitter=False, **common)

    motion = np.where(mult_mask, ref_at_sim / ref_at_hist, ref_at_sim - ref_at_hist)
    if cov_factor == "cholesky":
        L_ref = eps_cholesky(np.cov(ref_f, rowvar=False))
        L_hist = eps_cholesky(np.cov(hist_f, rowvar=False))
        # right-multiply by (L_ref @ L_hist^-1)^T without forming an inverse
        motion = motion @ np.linalg.solve(L_hist.T, L_ref.T)
    elif cov_factor == "std":
        motion = motion * (ref_f.std(axis=0) / hist_f.std(axis=0))

    displaced_ref = np.where(mult_mask, ref_f * motion, ref_f + motion)
    out[keep] = _send_points(sim_f, displaced_ref, spec, draws, jitter=jitter, **common)
    return out


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


def _run_groups(worker, n_groups: int):
    """Run the per-group transports thread-parallel (plan solves dominate and
    release the GIL in the C++ solver)."""
    if n_groups == 1:
        return [worker(0)]
    with ThreadPoolExecutor(max_workers=min(_MAX_PLAN_THREADS, n_groups)) as pool:
        return list(pool.map(worker, range(n_groups)))


def _assemble(da_like: DataArray, gi, pts_dim: str, group_results) -> DataArray:
    """Scatter per-group [P, V] results back onto the time axis (window
    centers only) and rewrap as a DataArray shaped like ``da_like``."""
    dac = da_like.move_dim_last("time")
    ax = dac.dims.index(pts_dim)
    out = np.full(np.moveaxis(np.asarray(dac.data), ax, 0).shape, np.nan)  # [V, T]
    for g, Z in enumerate(group_results):
        members = np.flatnonzero(gi.group_idx == g)
        out[:, members] = Z[gi.scatter_slot[members]].T
    res = DataArray(np.moveaxis(out, 0, ax), dac.dims, dict(dac.coords), dict(da_like.attrs), "scen")
    if dac.dims != da_like.dims:
        res = res.transpose(*da_like.dims)
    return res


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
        nvar = len(vnames)
        hist = _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames)

        gi = group.indexes(hist.time)
        ref_blocks = _grouped_PV(ref, group.indexes(ref.time), pts_dim)
        hist_blocks = _grouped_PV(hist, gi, pts_dim)
        spec = _BinSpec(
            _parse_bin_arg(bin_width, np.full(nvar, np.nan), nvar, vnames),
            _parse_bin_arg(bin_origin, np.zeros(nvar), nvar, vnames),
        )
        draw_keys = [next_key() for _ in range(gi.n_groups)]

        def worker(g: int) -> np.ndarray:
            return _otc_group(
                hist_blocks[g], ref_blocks[g], spec, _Draws(draw_keys[g]),
                num_iter_max=num_iter_max, normalization=normalization,
                solver=solver, jitter=jitter_inside_bins,
            )

        return _assemble(hist, gi, pts_dim, _run_groups(worker, gi.n_groups))


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
        nvar = len(vnames)
        hist = _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames)
        mult_mask = np.zeros(nvar, dtype=bool)
        for k, v in (kind or {}).items():
            mult_mask[vnames.index(k) if isinstance(k, str) else k] = v == "*"

        gi = group.indexes(sim.time)
        ref_blocks = _grouped_PV(ref, group.indexes(ref.time), pts_dim)
        hist_blocks = _grouped_PV(hist, group.indexes(hist.time), pts_dim)
        sim_blocks = _grouped_PV(sim, gi, pts_dim)
        spec = _BinSpec(
            _parse_bin_arg(bin_width, np.full(nvar, np.nan), nvar, vnames),
            _parse_bin_arg(bin_origin, np.zeros(nvar), nvar, vnames),
        )
        draw_keys = [next_key() for _ in range(gi.n_groups)]

        def worker(g: int) -> np.ndarray:
            return _dotc_group(
                sim_blocks[g], ref_blocks[g], hist_blocks[g], spec, _Draws(draw_keys[g]),
                num_iter_max=num_iter_max, cov_factor=cov_factor, jitter=jitter_inside_bins,
                mult_mask=mult_mask, normalization=normalization, solver=solver,
            )

        return _assemble(sim, gi, pts_dim, _run_groups(worker, gi.n_groups))


def _apply_adapt_freq(adapt_freq_thresh, ref, hist, group, pts_dim, vnames):
    """Per-variable frequency adaptation of hist (reference
    _adjustment.py:1390-1394)."""
    if not adapt_freq_thresh:
        return hist
    import jax.numpy as jnp

    from ..ops.segment import gather_groups, scatter_back
    from ..processing import _adapt_freq_grouped
    from ..utils.units import str2quantity

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
