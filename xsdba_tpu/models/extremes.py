"""Second-order extreme-value adjustment (reference ``adjustment.py:745-930``,
``_adjustment.py:1060-1233``).

Cluster extraction and the GPD ML fit run batched on device
(``ops/clusters.py``, ``ops/fitting.py``); the adjust step blends the
tail-corrected scenario into a first-order scenario with the smooth
transition function.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.clusters import cluster_maxima
from ..ops.fitting import gpd_cdf, gpd_fit_ml, gpd_ppf
from ..ops.interp import interp1d_table
from ..ops.quantile import nan_quantile
from ..utils.container import DataArray, Dataset
from ._wrap import scen_like, to_compute
from .base import TrainAdjust

__all__ = ["ExtremeValues"]


@partial(jax.jit, static_argnames=("n_out", "max_clusters", "use_ref_params"))
def _extremes_train_core(ref, hist, cluster_thresh, q_thresh, ref_params, *, n_out: int, max_clusters: int, use_ref_params: bool = False):
    """ref/hist [..., T] -> (px_hist [..., N], af [..., N], thresh [...],
    ref_c, ref_scale).

    With ``use_ref_params``, the GPD fit on ref is skipped and
    ``ref_params`` [..., 2] (shape, scale) is used instead (reference
    ``_extremes_train_1d`` ref_params reuse, _adjustment.py:1078-1084).
    """
    qt = jnp.asarray(q_thresh, ref.dtype)

    def subset_q(x):
        masked = jnp.where(x >= cluster_thresh, x, jnp.nan)
        return nan_quantile(masked, qt[None], axis=-1)[..., 0]

    thresh = (subset_q(ref) + subset_q(hist)) / 2

    def fit(x):
        mx = cluster_maxima(x, thresh[..., None], cluster_thresh, max_clusters=max_clusters)
        c, scale = gpd_fit_ml(mx - thresh[..., None])
        return c, scale

    if use_ref_params:
        ref_c, ref_s = ref_params[..., 0], ref_params[..., 1]
    else:
        ref_c, ref_s = fit(ref)
    hist_c, hist_s = fit(hist)

    px_ref = jnp.where(ref >= thresh[..., None], gpd_cdf(ref, ref_c[..., None], thresh[..., None], ref_s[..., None]), jnp.nan)
    hist_ext = jnp.where(hist >= thresh[..., None], hist, jnp.nan)
    px_hist = jnp.where(~jnp.isnan(hist_ext), gpd_cdf(hist_ext, hist_c[..., None], thresh[..., None], hist_s[..., None]), jnp.nan)

    pmax = jnp.minimum(jnp.nanmax(px_ref, axis=-1), jnp.nanmax(px_hist, axis=-1))
    pmin = jnp.maximum(jnp.nanmin(px_ref, axis=-1), jnp.nanmin(px_hist, axis=-1))
    common = (px_hist <= pmax[..., None]) & (px_hist >= pmin[..., None])
    px_hist = jnp.where(common, px_hist, jnp.nan)

    hist_in_ref = gpd_ppf(px_hist, ref_c[..., None], thresh[..., None], ref_s[..., None])
    af = hist_in_ref / hist_ext

    # sort by px (NaNs last) and truncate to the static output size
    order = jnp.argsort(jnp.where(jnp.isnan(px_hist), jnp.inf, px_hist), axis=-1)
    px_sorted = jnp.take_along_axis(px_hist, order, axis=-1)[..., :n_out]
    af_sorted = jnp.take_along_axis(jnp.where(jnp.isnan(px_hist), jnp.nan, af), order, axis=-1)[..., :n_out]
    return px_sorted, af_sorted, thresh, jnp.stack([ref_c, ref_s], axis=-1)


@partial(jax.jit, static_argnames=("interp", "extrapolation", "max_clusters"))
def _extremes_adjust_core(
    sim, scen, px_hist, af, thresh, cluster_thresh, frac, power, *, interp: str, extrapolation: str, max_clusters: int
):
    mx = cluster_maxima(sim, thresh[..., None], cluster_thresh, max_clusters=max_clusters)
    c, s = gpd_fit_ml(mx - thresh[..., None])
    px_fut = gpd_cdf(sim, c[..., None], thresh[..., None], s[..., None])

    af_t = interp1d_table(px_fut, px_hist, af, interp, extrapolation)
    scen_ext = sim * af_t

    smax = jnp.nanmax(sim, axis=-1, keepdims=True)
    transition = (((jnp.clip(sim - thresh[..., None], 0, None)) / (smax - thresh[..., None])) / frac) ** power
    transition = jnp.clip(transition, 0, 1)
    out = transition * scen_ext + (1 - transition) * scen
    return jnp.where(jnp.isnan(out), scen, out)


class ExtremeValues(TrainAdjust):
    r"""Second-order adjustment of extreme values (Roy et al.; reference
    adjustment.py:745-930).

    Train: the tail threshold is the mean ``q_thresh`` quantile of ref/hist
    exceedances over ``cluster_thresh``; Generalized Pareto distributions are
    fit on cluster maxima; factors map hist's tail onto ref's.  Adjust blends
    the tail correction into a first-order ``scen`` with a smooth transition
    controlled by ``frac`` and ``power``.
    """

    _allow_diff_calendars = True

    @classmethod
    def _train(
        cls,
        ref: DataArray,
        hist: DataArray,
        *,
        cluster_thresh: str,
        ref_params: Any = None,
        q_thresh: float = 0.95,
    ):
        from ..utils.units import convert_units_to

        ct = convert_units_to(cluster_thresh, ref.units)
        refa, bdims, bcoords = to_compute(ref)
        hista, _, _ = to_compute(hist)
        T = refa.shape[-1]
        # bucket the series length so nearby lengths share one compilation
        refa = _pad_time(refa)
        hista = _pad_time(hista)
        N = int((1 - q_thresh) * T * 1.05)
        if ref_params is not None:
            # reuse a previous training's fitted ref GPD (stored in its ds)
            rp = ref_params["ref_params"] if hasattr(ref_params, "keys") or hasattr(ref_params, "data_vars") else ref_params
            rp = jnp.asarray(rp.data if hasattr(rp, "data") else rp, dtype=refa.dtype)
            use_rp = True
        else:
            rp = jnp.zeros(refa.shape[:-1] + (2,), dtype=refa.dtype)
            use_rp = False
        px_hist, af, thresh, ref_fit = _extremes_train_core(
            refa, hista, jnp.asarray(ct, refa.dtype), q_thresh, rp, n_out=N,
            max_clusters=_cluster_bound(T, q_thresh), use_ref_params=use_rp
        )
        qcoord = np.arange(N)
        ds = Dataset(
            {
                "px_hist": DataArray(px_hist, tuple(bdims) + ("quantiles",), {**bcoords, "quantiles": qcoord}, {"long_name": "Probability of historical extremes"}, "px_hist"),
                "af": DataArray(af, tuple(bdims) + ("quantiles",), {**bcoords, "quantiles": qcoord}, {"standard_name": "Adjustment factors"}, "af"),
                "thresh": DataArray(thresh.reshape(thresh.shape + (1,)), tuple(bdims) + ("group",), {**bcoords, "group": np.array([1])}, {"units": ref.units}, "thresh"),
                "ref_params": DataArray(ref_fit, tuple(bdims) + ("gpd_param",), {**bcoords, "gpd_param": np.array(["c", "scale"])}, {"long_name": "Fitted GPD parameters of ref cluster maxima"}, "ref_params"),
            }
        )
        return ds, {"cluster_thresh": float(ct), "q_thresh": q_thresh}

    def _adjust(
        self,
        sim: DataArray,
        scen: DataArray,
        *,
        frac: float | None = None,
        power: float | None = None,
        interp: str = "linear",
        extrapolation: str = "constant",
    ):
        if frac is None or power is None:
            # reference adjustment.py:905-914: the defaults changed from
            # (0.25, 1) to (0.70, 3) in v0.6.1 and silent reliance on them
            # warns
            warnings.warn(
                "No value was provided for the `frac` and/or `power` parameters; "
                "using the current defaults frac=0.70, power=3. Set them "
                "explicitly to silence this warning.",
                FutureWarning,
                stacklevel=2,
            )
        frac = 0.70 if frac is None else frac
        power = 3.0 if power is None else power
        sima, _, _ = to_compute(sim)
        scena, _, _ = to_compute(scen)
        T = sima.shape[-1]
        out = _extremes_adjust_core(
            _pad_time(sima),
            _pad_time(scena),
            jnp.asarray(self.ds["px_hist"].data),
            jnp.asarray(self.ds["af"].data),
            jnp.asarray(self.ds["thresh"].data)[..., 0],
            jnp.asarray(self.cluster_thresh, sima.dtype),
            jnp.asarray(frac, sima.dtype),
            jnp.asarray(power, sima.dtype),
            interp=interp,
            extrapolation=extrapolation,
            max_clusters=_cluster_bound(T, self.q_thresh),
        )
        return scen_like(sim, out[..., :T])


def _pad_time(x, step: int = 4096):
    """NaN-pad the time axis to a multiple of ``step`` so nearby series
    lengths reuse one compilation (NaNs are inert in every core: quantile
    subsets, cluster exceedance tests, GPD cdf/ppf and the final blend)."""
    import jax.numpy as jnp

    T = x.shape[-1]
    pad = -T % step
    if pad == 0:
        return jnp.asarray(x)
    return jnp.pad(jnp.asarray(x), [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=jnp.nan)


def _cluster_bound(T: int, q_thresh: float) -> int:
    """Static cluster-count bound: the reference's own over-allocation
    ``(1-q_thresh)*T*1.05`` (adjustment.py:856) — safe here because only
    qualifying clusters (max > the q_thresh threshold) consume a label
    (see ops/clusters.py)."""
    return max(int((1 - q_thresh) * T * 1.05) + 8, 16)
