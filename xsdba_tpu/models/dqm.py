"""Detrended Quantile Mapping (reference ``adjustment.py:531-671``,
``_adjustment.py:86-190,679-780``).

Train: EQM on mean-normalized ref/hist + a group-mean scaling factor.
Adjust: scale sim, remove its polynomial/LOESS trend, quantile-map the
detrended series, put the trend back.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..detrending import BaseDetrend, PolyDetrend
from ..ops.correction import ADDITIVE, apply_correction, equally_spaced_nodes, get_correction, invert
from ..ops.quantile import nan_quantile
from ..utils.container import DataArray, Dataset
from ..utils.grouper import Grouper
from ..utils.options import EXTRA_OUTPUT, get_option
from . import _algos
from ._wrap import device_brackets, fold_add_dims, grouped_var, scen_like, to_compute
from .base import TrainAdjust

__all__ = ["DetrendedQuantileMapping"]


class DetrendedQuantileMapping(TrainAdjust):
    r"""DQM: quantile mapping on detrended, mean-scaled data
    (Cannon et al. 2015; reference adjustment.py:531-671)."""

    _allow_diff_calendars = False
    _allow_diff_training_times = False

    @classmethod
    def _train(
        cls,
        ref: DataArray,
        hist: DataArray,
        *,
        nquantiles: int | np.ndarray = 20,
        kind: str = ADDITIVE,
        group: str | Grouper = "time",
        adapt_freq_thresh: str | None = None,
        jitter_under_thresh_value: str | None = None,
        jitter_over_thresh_value: str | None = None,
        jitter_over_thresh_upper_bnd: str | None = None,
        max_tail_factor: float | None = None,
    ) -> tuple[Dataset, dict[str, Any]]:
        group = Grouper(group) if isinstance(group, str) else group
        if group.prop not in ("group", "dayofyear"):
            warnings.warn(
                f"DQM is best used with 'time' or 'time.dayofyear' grouping, got {group.name} "
                "(reference adjustment.py:608-609).",
                stacklevel=4,
            )
        if np.isscalar(nquantiles):
            quantiles = equally_spaced_nodes(int(nquantiles))
        else:
            quantiles = np.asarray(nquantiles)

        gi = group.indexes(ref.time)
        if group.add_dims:
            # pooled training over the extra dims (reference base.py:413)
            (refa, hista), bdims, bcoords, n_add = fold_add_dims(group, ref, hist)
            gi_t = gi.expand(n_add)
        else:
            refa, bdims, bcoords = to_compute(ref)
            hista, _, _ = to_compute(hist)
            gi_t = gi
        quantiles = quantiles.astype(refa.dtype)  # .dtype reads metadata; np.asarray would fetch the whole device array

        hist_q_raw = None
        if max_tail_factor is not None:
            from ..ops.quantile import grouped_nan_quantile

            hist_q_raw = grouped_nan_quantile(hista, gi_t.gather_idx, quantiles)

        from .eqm import _apply_jitter, _preprocess

        hista = _apply_jitter(hista, hist, jitter_under_thresh_value, jitter_over_thresh_value, jitter_over_thresh_upper_bnd)
        if adapt_freq_thresh is None:
            if gi_t.merge_plan is not None:
                # shared-sort merge path (normalization commutes with
                # quantiles — see _algos.dqm_train_windowed)
                af, hist_q, scaling = _algos.dqm_train_windowed(
                    refa, hista, gi_t.merge_plan, jnp.asarray(quantiles), kind=kind
                )
            else:
                # memory-bounded chunked path
                af, hist_q, scaling = _algos.dqm_train_from_raw(
                    refa, hista, jnp.asarray(gi_t.gather_idx), jnp.asarray(quantiles), kind=kind
                )
            P0_ref = P0_hist = pth = None
        else:
            refg, histg, P0_ref, P0_hist, pth = _preprocess(
                refa, hista, gi_t, hist, adapt_freq_thresh, None, None, None
            )
            # mean-normalize within each group (reference _adjustment.py:165-168)
            mu_ref = jnp.nanmean(refg, axis=-1)
            mu_hist = jnp.nanmean(histg, axis=-1)
            refn = apply_correction(refg, invert(mu_ref[..., None], kind), kind)
            histn = apply_correction(histg, invert(mu_hist[..., None], kind), kind)

            ref_q = nan_quantile(refn, quantiles, axis=-1)
            hist_q = nan_quantile(histn, quantiles, axis=-1)
            af = get_correction(hist_q, ref_q, kind)
            scaling = get_correction(mu_hist, mu_ref, kind)

        qdim = ("quantiles", quantiles)
        ds = Dataset(
            {
                "af": grouped_var(af, bdims, bcoords, gi, qdim, name="af", attrs={"standard_name": "Adjustment factors"}),
                "hist_q": grouped_var(hist_q, bdims, bcoords, gi, qdim, name="hist_q"),
                "scaling": grouped_var(scaling, bdims, bcoords, gi, name="scaling", attrs={"standard_name": "Scaling factor"}),
            }
        )
        if hist_q_raw is not None:
            ds["hist_q_raw"] = grouped_var(hist_q_raw, bdims, bcoords, gi, qdim, name="hist_q_raw")
        if adapt_freq_thresh is not None:
            ds["P0_ref"] = grouped_var(P0_ref, bdims, bcoords, gi, name="P0_ref")
            ds["P0_hist"] = grouped_var(P0_hist, bdims, bcoords, gi, name="P0_hist")
            ds["pth"] = grouped_var(pth, bdims, bcoords, gi, name="pth")

        return ds, {
            "group": group,
            "kind": kind,
            "adapt_freq_thresh": adapt_freq_thresh,
            "max_tail_factor": max_tail_factor,
        }

    def _adjust(
        self,
        sim: DataArray,
        interp: str = "nearest",
        extrapolation: str = "constant",
        detrend: int | BaseDetrend = 1,
        mode: str = "blend",
    ):
        from .eqm import (
            _adjust_preprocess,
            _apply_max_tail_mask,
            _reference_af_lookup,
            _use_reference_interp,
        )

        group: Grouper = self.group
        gi = group.indexes(sim.time)
        sima, _, _ = to_compute(sim)
        sima = _adjust_preprocess(self, sima, sim, gi)

        # scale sim by the group scaling factor (doy groups use nearest;
        # reference _adjustment.py:745-753)
        interp_b = interp if gi.prop != "dayofyear" else "nearest"
        scaling_t = _algos.broadcast_groups_core(
            jnp.asarray(self.ds["scaling"].data), device_brackets(gi, interp_b)
        )
        scaled = apply_correction(sima, scaling_t, self.kind)
        scaled_da = scen_like(sim, scaled)
        scaled_da.attrs["units"] = sim.units

        if isinstance(detrend, int):
            detrending = PolyDetrend(degree=detrend, kind=self.kind, group=group)
        else:
            detrending = detrend
        detrending = detrending.fit(scaled_da)
        det = detrending.detrend(scaled_da)

        deta, _, _ = to_compute(det)
        if _use_reference_interp(mode, gi):
            af_t = _reference_af_lookup(
                deta,
                jnp.asarray(self.ds["hist_q"].data),
                jnp.asarray(self.ds["af"].data),
                gi,
                interp,
                extrapolation,
            )
            scen = apply_correction(deta, af_t, self.kind)
        else:
            scen = _algos.qm_adjust_core(
                deta,
                jnp.asarray(self.ds["hist_q"].data),
                jnp.asarray(self.ds["af"].data),
                device_brackets(gi, interp),
                kind=self.kind,
                interp=interp,
                extrapolation=extrapolation,
                tables_compact=True,  # trained tables: ascending, NaN rows whole
            )
        scen = detrending.retrend(scen_like(sim, scen))
        scena = jnp.asarray(scen.move_dim_last("time").data)
        scena = _apply_max_tail_mask(self, sima, scena, gi, interp)

        out = Dataset({"scen": scen_like(sim, scena), "trend": detrending.ds["trend"]})
        if get_option(EXTRA_OUTPUT):
            return out
        return out["scen"]
