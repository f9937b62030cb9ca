"""Detrending objects (reference ``detrending.py``).

fit/detrend/retrend scheme over jitted trend cores: polynomial (normal
equations), LOESS (windowed WLS), rolling mean, mean, none.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from .ops.correction import ADDITIVE, apply_correction, invert
from .ops.segment import gather_groups, scatter_back
from .utils.container import DataArray, Dataset
from .utils.grouper import Grouper
from .utils.params import ParametrizableWithDataset

__all__ = [
    "BaseDetrend",
    "LoessDetrend",
    "MeanDetrend",
    "NoDetrend",
    "PolyDetrend",
    "RollingMeanDetrend",
]


class BaseDetrend(ParametrizableWithDataset):
    """fit(da) -> fitted object; detrend(da); retrend(da)
    (reference detrending.py:17-131)."""

    def __init__(self, *, group: str | Grouper = "time", kind: str = ADDITIVE, mult_skip_zeros: bool = False, **kwargs):
        group = Grouper(group) if isinstance(group, str) else group
        super().__init__(group=group, kind=kind, mult_skip_zeros=mult_skip_zeros, **kwargs)

    @property
    def fitted(self) -> bool:
        return hasattr(self, "ds")

    def fit(self, da: DataArray) -> "BaseDetrend":
        new = self.__class__(**self.parameters)
        trend = new._get_trend(da)
        trend.name = "trend"
        if "units" in da.attrs:
            trend.attrs["units"] = da.attrs["units"]
        new.set_dataset(Dataset({"trend": trend}))
        return new

    def detrend(self, da: DataArray) -> DataArray:
        if not self.fitted:
            raise ValueError("You must call fit() before detrending.")
        trend = self.ds["trend"]
        out = apply_correction(jnp.asarray(da.move_dim_last("time").data), invert(jnp.asarray(trend.move_dim_last("time").data), self.kind), self.kind)
        if self.mult_skip_zeros and self.kind != "*":
            warnings.warn("mult_skip_zeros is only used for kind='*'; ignored.", UserWarning, stacklevel=2)
        if self.mult_skip_zeros and self.kind == "*":
            tr = jnp.asarray(trend.move_dim_last("time").data)
            out = jnp.where(tr != 0, out, jnp.asarray(da.move_dim_last("time").data))
        from .models._wrap import scen_like

        return scen_like(da, out, name=da.name)

    def retrend(self, da: DataArray) -> DataArray:
        if not self.fitted:
            raise ValueError("You must call fit() before retrending.")
        trend = jnp.asarray(self.ds["trend"].move_dim_last("time").data)
        out = apply_correction(jnp.asarray(da.move_dim_last("time").data), trend, self.kind)
        from .models._wrap import scen_like

        return scen_like(da, out, name=da.name)

    # subclasses implement
    def _get_trend(self, da: DataArray) -> DataArray:
        raise NotImplementedError

    def __repr__(self):
        rep = super().__repr__()
        return rep if self.fitted else f"<{rep} | unfitted>"


class NoDetrend(BaseDetrend):
    """Does nothing (reference detrending.py:134-147)."""

    def _get_trend(self, da):
        zeros = jnp.zeros_like(jnp.asarray(da.data))
        return da.copy(data=zeros)

    def detrend(self, da):
        self._require_fit()
        return da

    def retrend(self, da):
        self._require_fit()
        return da

    def _require_fit(self):
        if not self.fitted:
            raise ValueError("You must call fit() first.")


class MeanDetrend(BaseDetrend):
    """Group-mean trend (reference detrending.py:150-162)."""

    def _get_trend(self, da):
        gi = self.group.indexes(da.time)
        x = jnp.asarray(da.move_dim_last("time").data)
        means = jnp.nanmean(gather_groups(x, gi.gather_idx), axis=-1)
        trend = means[..., gi.group_idx]
        from .models._wrap import scen_like

        return scen_like(da, trend, name="trend")


class PolyDetrend(BaseDetrend):
    """Polynomial trend per group (reference detrending.py:165-208);
    degree default 4, optional mean preservation."""

    def __init__(self, group="time", kind=ADDITIVE, degree=4, preserve_mean=False, mult_skip_zeros=False):
        super().__init__(group=group, kind=kind, degree=degree, preserve_mean=preserve_mean, mult_skip_zeros=mult_skip_zeros)

    def _get_trend(self, da):
        from .ops.detrend import grouped_polyfit_trend

        gi = self.group.indexes(da.time)
        x = jnp.asarray(da.move_dim_last("time").data)
        tcoord = np.asarray(da.time.ordinal, dtype=np.float64)
        trend = grouped_polyfit_trend(x, tcoord, gi.gather_idx, gi.group_idx, gi.scatter_slot, degree=int(self.degree))
        if self.preserve_mean:
            tg = gather_groups(trend, gi.gather_idx)
            gmean = jnp.nanmean(tg, axis=-1)
            trend = apply_correction(trend, invert(gmean[..., gi.group_idx], self.kind), self.kind)
        from .models._wrap import scen_like

        return scen_like(da, trend, name="trend")


class LoessDetrend(BaseDetrend):
    """LOESS trend (reference detrending.py:211-296): piecewise local
    regression with tricube/gaussian weights and robustness iterations."""

    def __init__(self, group="time", kind=ADDITIVE, f=0.2, niter=1, d=0, weights="tricube", equal_spacing=None, skipna=True, mult_skip_zeros=False):
        import warnings

        # accepted for reference API parity, but this implementation always
        # runs the equal-spacing core with NaNs zero-weighted (the two
        # documented LOESS deviations, measured and bounded in PARITY.md)
        if equal_spacing is False:
            warnings.warn(
                "LoessDetrend: equal_spacing=False is not supported — samples are "
                "treated as equally spaced (docs/PARITY.md).",
                UserWarning, stacklevel=2,
            )
        if skipna is False:
            warnings.warn(
                "LoessDetrend: skipna=False is not supported — NaNs are always "
                "zero-weighted (docs/PARITY.md).",
                UserWarning, stacklevel=2,
            )
        super().__init__(group=group, kind=kind, f=f, niter=niter, d=d, weights=weights, equal_spacing=equal_spacing, skipna=skipna, mult_skip_zeros=mult_skip_zeros)

    def _get_trend(self, da):
        from .ops.loess import loess_smoothing

        gi = self.group.indexes(da.time)
        x = jnp.asarray(da.move_dim_last("time").data)
        tcoord = np.asarray(da.time.ordinal, dtype=np.float64)
        if gi.n_groups == 1:
            trend = loess_smoothing(x, tcoord, f=self.f, niter=int(self.niter), d=int(self.d), weights=self.weights)
        else:
            # Per-group loess over the group's member sequence.  Documented
            # deviation: members are treated as equally spaced (their rank
            # position is the x coordinate) — exact for group="time", an
            # approximation for seasonal groups, where the reference itself
            # recommends LOESS only on the main dim (detrending.py:243-246).
            xg = gather_groups(x, gi.gather_idx)
            pos = np.arange(xg.shape[-1], dtype=np.float64)
            trend_g = loess_smoothing(xg, pos, f=self.f, niter=int(self.niter), d=int(self.d), weights=self.weights)
            trend = scatter_back(trend_g, gi.group_idx, gi.scatter_slot)
        from .models._wrap import scen_like

        return scen_like(da, trend, name="trend")


class RollingMeanDetrend(BaseDetrend):
    """Centered rolling-mean trend, optionally weighted
    (reference detrending.py:299-356)."""

    def __init__(self, group="time", kind=ADDITIVE, win=30, weights=None, min_periods=None, mult_skip_zeros=False):
        if weights is not None:
            weights = np.asarray(weights, dtype=np.float64)
            weights = weights / weights.sum()
            if min_periods is not None:
                raise NotImplementedError("Setting both `min_periods` and `weights` is not implemented yet.")
        super().__init__(group=group, kind=kind, win=int(win), weights=weights, min_periods=min_periods, mult_skip_zeros=mult_skip_zeros)

    def _get_trend(self, da):
        gi = self.group.indexes(da.time)
        x = jnp.asarray(da.move_dim_last("time").data)

        def roll(series):
            n = series.shape[-1]
            win = self.win
            half = win // 2
            idx = jnp.arange(n)[:, None] + jnp.arange(win)[None, :] - half
            valid = (idx >= 0) & (idx < n)
            vals = series[..., jnp.clip(idx, 0, n - 1)]
            vals = jnp.where(valid, vals, jnp.nan)
            if self.weights is not None:
                w = jnp.asarray(self.weights, dtype=series.dtype)
                return jnp.sum(vals * w, axis=-1)
            nan = jnp.isnan(vals)
            cnt = jnp.sum(~nan, axis=-1)
            minp = self.min_periods if self.min_periods is not None else win
            mean = jnp.nansum(jnp.where(nan, 0, vals), axis=-1) / jnp.where(cnt == 0, 1, cnt)
            return jnp.where(cnt >= minp, mean, jnp.nan)

        if gi.n_groups == 1:
            trend = roll(x)
        else:
            xg = gather_groups(x, gi.gather_idx)
            trend = scatter_back(roll(xg), gi.group_idx, gi.scatter_slot)
        from .models._wrap import scen_like

        return scen_like(da, trend, name="trend")
