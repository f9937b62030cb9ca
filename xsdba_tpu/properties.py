"""Statistical properties — the diagnostics layer (reference ``properties.py``).

The reference builds these on xclim's Indicator machinery; here a light
:class:`StatisticalProperty` wrapper carries the same metadata contract
(aspect, allowed groups, default measure) around plain compute functions over
:class:`~xsdba_tpu.utils.container.DataArray`.  Marginal/temporal properties
are one fused gather + reduction on device; spatial ones use all-site
matrices (the lone collective pattern of this domain, SURVEY §2.10).
"""

from __future__ import annotations

import operator

import jax.numpy as jnp
import numpy as np

from .models._wrap import grouped_var
from .ops.segment import gather_groups
from .utils.container import DataArray
from .utils.grouper import Grouper, period_blocks
from .utils.units import convert_units_to

__all__ = [
    "StatisticalProperty",
    "acf",
    "annual_cycle_amplitude",
    "annual_cycle_asymmetry",
    "annual_cycle_maximum",
    "annual_cycle_minimum",
    "annual_cycle_phase",
    "corr_btw_var",
    "decorrelation_length",
    "mean",
    "mean_annual_phase",
    "mean_annual_range",
    "mean_annual_relative_range",
    "quantile",
    "relative_annual_cycle_amplitude",
    "relative_frequency",
    "return_value",
    "skewness",
    "spatial_correlogram",
    "spell_length_distribution",
    "spectral_variance",
    "std",
    "transition_probability",
    "trend",
    "var",
]

_OPS = {">": operator.gt, "<": operator.lt, ">=": operator.ge, "<=": operator.le, "==": operator.eq, "!=": operator.ne,
        "gt": operator.gt, "lt": operator.lt, "ge": operator.ge, "le": operator.le, "eq": operator.eq, "ne": operator.ne}


class StatisticalProperty:
    """Wraps a compute function with the reference Indicator contract
    (``properties.py:41-113``): aspect in {marginal, temporal, multivariate,
    spatial}, allowed groups, a default measure name."""

    def __init__(self, identifier, aspect, compute, allowed_groups=None, measure="bias", units=None):
        self.identifier = identifier
        self.aspect = aspect
        self._compute = compute
        self.allowed_groups = allowed_groups
        self.measure = measure
        self.__doc__ = compute.__doc__

    def __call__(self, da, *args, **kwargs):
        if "group" in kwargs:
            group = kwargs["group"]
        else:
            # honor the compute function's own default (e.g. acf defaults to
            # "time.season" — forcing "time" here would fail its
            # allowed_groups check before the default could apply)
            import inspect

            p = inspect.signature(self._compute).parameters.get("group")
            group = p.default if p is not None and p.default is not inspect.Parameter.empty else "time"
        group = Grouper(group) if isinstance(group, str) else group
        if self.allowed_groups is not None and group.prop not in self.allowed_groups:
            raise ValueError(
                f"Grouping period {group.prop} is not allowed for property {self.identifier} "
                f"(needs one of {self.allowed_groups})."
            )
        kwargs["group"] = group
        out = self._compute(da, *args, **kwargs)
        out.attrs.setdefault("long_name", self.identifier)
        out.attrs["aspect"] = self.aspect
        return out

    def get_measure(self):
        from . import measures

        return getattr(measures, self.measure)


def _grouped_reduce(da: DataArray, group: Grouper, fn, units=None, name=None):
    gi = group.indexes(da.time)
    dac = da.move_dim_last("time")
    vals = fn(gather_groups(jnp.asarray(dac.data), gi.gather_idx))
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    out = grouped_var(vals, bdims, bcoords, gi, name=name)
    if gi.prop == "group":
        out = DataArray(jnp.asarray(out.data)[..., 0], bdims, bcoords, out.attrs, name)
    out.attrs["units"] = units if units is not None else da.units
    return out


# -- marginal ---------------------------------------------------------------


def _mean(da, *, group="time"):
    """Mean of the variable (reference properties.py:116-155)."""
    return _grouped_reduce(da, group, lambda v: jnp.nanmean(v, axis=-1), name="mean")


def _var(da, *, group="time"):
    """Variance (reference properties.py:158-196)."""
    u = da.units
    out = _grouped_reduce(da, group, lambda v: jnp.nanvar(v, axis=-1), name="var")
    out.attrs["units"] = f"({u})2" if u else ""
    return out


def _std(da, *, group="time"):
    """Standard deviation (reference properties.py:199-235)."""
    return _grouped_reduce(da, group, lambda v: jnp.nanstd(v, axis=-1), name="std")


def _skewness(da, *, group="time"):
    """Fisher-Pearson skewness (scipy.stats.skew semantics; reference
    properties.py:238-257)."""

    def fn(v):
        mu = jnp.nanmean(v, axis=-1, keepdims=True)
        sd = jnp.nanstd(v, axis=-1, keepdims=True)
        return jnp.nanmean(((v - mu) / sd) ** 3, axis=-1)

    out = _grouped_reduce(da, group, fn, units="", name="skewness")
    return out


def _quantile(da, *, q=0.98, group="time"):
    """Quantile q of the variable (reference properties.py:260-294)."""
    from .ops.quantile import nan_quantile

    def fn(v):
        return nan_quantile(v, jnp.asarray([q], v.dtype), axis=-1)[..., 0]

    return _grouped_reduce(da, group, fn, name="quantile")


mean = StatisticalProperty("mean", "marginal", _mean)
var = StatisticalProperty("var", "marginal", _var)
std = StatisticalProperty("std", "marginal", _std)
skewness = StatisticalProperty("skewness", "marginal", _skewness)
quantile = StatisticalProperty("quantile", "marginal", _quantile)


# -- temporal ---------------------------------------------------------------


def _run_lengths(cond):
    """Per-row run lengths of True runs, -1 padded to L//2 (static)."""
    # positions where runs end; length computed via cumulative run ids
    L = cond.shape[-1]
    idx = jnp.arange(L)
    prev = jnp.concatenate([jnp.zeros_like(cond[..., :1]), cond[..., :-1]], axis=-1)
    starts = cond & ~prev
    rid = jnp.cumsum(starts, axis=-1) * cond  # 1-based run id
    C = L // 2 + 1

    import jax

    def per_row(c, r):
        seg = jnp.where(c, r, C + 1)
        ones = jnp.ones_like(r)
        ln = jax.ops.segment_sum(jnp.where(c, ones, 0), seg, num_segments=C + 2)
        return ln[1 : C + 1]

    fn = per_row
    for _ in range(cond.ndim - 1):
        fn = jax.vmap(fn)
    lengths = fn(cond, rid)
    return jnp.where(lengths > 0, lengths, -1)


def _stat_reduce(x, stat, axis=-1):
    x = jnp.where(x < 0, jnp.nan, x)  # -1 pads
    if stat == "mean":
        return jnp.nanmean(x, axis=axis)
    if stat == "sum":
        return jnp.nansum(jnp.where(jnp.isnan(x), 0, x), axis=axis)
    if stat == "max":
        return jnp.nanmax(x, axis=axis)
    if stat == "min":
        return jnp.nanmin(x, axis=axis)
    raise ValueError(f"Unknown stat {stat!r}")


def _spell_length_distribution(da, *, method="amount", op=">=", thresh="1 mm d-1", window=1,
                               stat="mean", stat_resample=None, group="time"):
    """Statistic of the spell-length distribution (reference
    properties.py:297-422): per resample period, lengths of runs where the
    condition holds for at least ``window`` days; ``stat_resample`` over the
    spells of each period, ``stat`` over the periods of each group."""
    stat_resample = stat_resample or stat
    cond, dac = _make_cond(da, method, op, thresh)
    x = jnp.asarray(dac.data)

    gather, period_group = period_blocks(da.time, group.prop)
    condp = jnp.where(gather >= 0, cond[..., jnp.clip(gather, 0, x.shape[-1] - 1)], False)  # [..., P, L]
    lengths = _run_lengths(condp).astype(x.dtype)                                           # [..., P, C]
    lengths = jnp.where((lengths > 0) & (lengths < window), -1, lengths)
    per_period = _stat_reduce(lengths, stat_resample, axis=-1)                              # [..., P]
    return _periods_to_groups(per_period, period_group, group, da, stat, "spell_length_distribution", "d")


def _acf(da, *, lag=1, group="time.season"):
    """Lag-k autocorrelation per resample period, averaged over periods
    (statsmodels.acf semantics: overall-mean anomalies, n denominator;
    reference properties.py:485-545)."""
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    gather, period_group = period_blocks(da.time, group.prop)
    xp = jnp.where(gather >= 0, x[..., jnp.clip(gather, 0, x.shape[-1] - 1)], jnp.nan)  # [..., P, L]

    mu = jnp.nanmean(xp, axis=-1, keepdims=True)
    a = xp - mu
    var = jnp.nansum(jnp.where(jnp.isnan(a), 0, a * a), axis=-1)
    a0 = jnp.where(jnp.isnan(a), 0, a)
    cov = jnp.sum(a0[..., lag:] * a0[..., :-lag], axis=-1)
    r = cov / jnp.where(var == 0, 1, var)

    G = group.n_groups(da.time)
    out = jnp.stack([jnp.nanmean(r[..., np.flatnonzero(period_group == g)], axis=-1) for g in range(G)], axis=-1)
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    res = grouped_var(out, bdims, bcoords, group.indexes(da.time), name="acf")
    res.attrs["units"] = ""
    return res


def _doy_climatology(da, window):
    """Daily climatology [..., 365] with circular rolling mean."""
    gi = Grouper("time.dayofyear").indexes(da.time)
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    clim = jnp.nanmean(gather_groups(x, gi.gather_idx), axis=-1)  # [..., maxdoy]
    clim = clim[..., :365]
    if window > 1:
        h = window // 2
        pad = jnp.concatenate([clim[..., -h:], clim, clim[..., :h]], axis=-1)
        idx = jnp.arange(365)[:, None] + jnp.arange(window)[None, :]
        clim = jnp.nanmean(pad[..., idx], axis=-1)
    return clim, dac


def _annual_cycle(da, *, stat="absamp", window=31, group="time"):
    """Annual-cycle statistics from the smoothed daily climatology
    (reference properties.py:548-676)."""
    clim, dac = _doy_climatology(da, window)
    mx = jnp.nanmax(clim, axis=-1)
    mn = jnp.nanmin(clim, axis=-1)
    units = da.units
    if stat == "absamp":
        out = mx - mn
    elif stat == "relamp":
        out = (mx - mn) * 100 / jnp.nanmean(clim, axis=-1)
        units = "%"
    elif stat == "phase":
        # nanargmax returns -1 for all-NaN slices (ocean sites): mask to NaN
        allnan = jnp.all(jnp.isnan(clim), axis=-1)
        out = jnp.where(allnan, jnp.nan, (jnp.nanargmax(clim, axis=-1) + 1).astype(clim.dtype))
        units = ""
    elif stat == "min":
        out = mn
    elif stat == "max":
        out = mx
    elif stat == "asymmetry":
        allnan = jnp.all(jnp.isnan(clim), axis=-1)
        raw = ((jnp.nanargmax(clim, axis=-1) - jnp.nanargmin(clim, axis=-1)) % 365) / 365
        out = jnp.where(allnan, jnp.nan, raw.astype(clim.dtype))
        units = "yr"
    else:
        raise ValueError(f"Unknown stat {stat!r}")
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    res = DataArray(out, bdims, bcoords, {"units": units}, f"annual_cycle_{stat}")
    return res


def _annual_statistic(da, *, stat="absamp", window=31, group="time"):
    """Mean annual range statistics from the rolling-smoothed series
    (reference properties.py:679-756): per-year max/min stats averaged."""
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    if window > 1:
        h = window // 2
        idx = jnp.clip(jnp.arange(x.shape[-1])[:, None] + jnp.arange(window)[None, :] - h, 0, x.shape[-1] - 1)
        x = jnp.nanmean(x[..., idx], axis=-1)
    gather, _ = period_blocks(da.time, "group")  # yearly blocks
    xp = jnp.where(gather >= 0, x[..., jnp.clip(gather, 0, x.shape[-1] - 1)], jnp.nan)  # [..., Y, L]
    mx = jnp.nanmax(xp, axis=-1)
    mn = jnp.nanmin(xp, axis=-1)
    units = da.units
    if stat == "absamp":
        out = jnp.nanmean(mx - mn, axis=-1)
    elif stat == "relamp":
        out = jnp.nanmean((mx - mn) * 100 / jnp.nanmean(xp, axis=-1), axis=-1)
        units = "%"
    elif stat == "phase":
        doy = jnp.asarray(da.time.dayofyear)
        doyp = jnp.where(gather >= 0, doy[jnp.clip(gather, 0, x.shape[-1] - 1)], 0)
        am = jnp.nanargmax(jnp.where(jnp.isnan(xp), -jnp.inf, xp), axis=-1)
        per_year = jnp.take_along_axis(jnp.broadcast_to(doyp, xp.shape).astype(x.dtype), jnp.clip(am[..., None], 0, None), axis=-1)[..., 0]
        # all-NaN years (or whole ocean sites) must not contribute a fake
        # Jan-1 phase: NaN them and nanmean over the valid years
        per_year = jnp.where(jnp.any(~jnp.isnan(xp), axis=-1), per_year, jnp.nan)
        out = jnp.nanmean(per_year, axis=-1)
        units = ""
    else:
        raise ValueError(f"Unknown stat {stat!r}")
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    return DataArray(out, bdims, bcoords, {"units": units}, f"mean_annual_{stat}")


def _relative_frequency(da, *, op=">=", thresh="1 mm d-1", group="time"):
    """Relative frequency of the condition per group (reference
    properties.py:1072-1127)."""
    t = convert_units_to(thresh, da.units)

    def fn(v):
        cond = _OPS[op](v, t)
        n = jnp.sum(~jnp.isnan(v), axis=-1)
        return jnp.sum(jnp.where(jnp.isnan(v), False, cond), axis=-1) / jnp.where(n == 0, 1, n)

    return _grouped_reduce(da, group, fn, units="", name="relative_frequency")


def _transition_probability(da, *, initial_op=">=", final_op=">=", thresh="1 mm d-1", group="time"):
    """P(state(t) & state(t+1)) per group (reference properties.py:1130-1186)."""
    t = convert_units_to(thresh, da.units)
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    today = x[..., :-1]
    tomorrow = x[..., 1:]
    cond = (_OPS[initial_op](today, t) & _OPS[final_op](tomorrow, t)).astype(x.dtype)
    cond = jnp.where(jnp.isnan(today) | jnp.isnan(tomorrow), jnp.nan, cond)
    sub = DataArray(cond, dac.dims, {**{d: dac.coords[d] for d in dac.dims[:-1] if d in dac.coords}, "time": da.time.isel(slice(0, -1))}, {"units": ""}, da.name)
    return _grouped_reduce(sub, group, lambda v: jnp.nanmean(v, axis=-1), units="", name="transition_probability")


def _trend(da, *, group="time", output="slope"):
    """Interannual linear trend of per-period means (scipy.linregress
    attributes; reference properties.py:1189-1255).

    Device-vectorized: period means are gathered into a [..., G, Pmax] block
    (periods in chronological order per group, NaN-padded) and all
    regressions run through one closed-form ``linregress_field`` call."""
    from .ops.fitting import linregress_field

    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    gather, period_group = period_blocks(da.time, group.prop)
    xg = jnp.where(jnp.asarray(gather) >= 0, x[..., jnp.clip(jnp.asarray(gather), 0, x.shape[-1] - 1)], jnp.nan)
    pm = jnp.nanmean(xg, axis=-1)  # [..., P]

    G = group.n_groups(da.time)
    counts = np.bincount(period_group, minlength=G)
    pmax = max(int(counts.max()), 1)
    idx = np.full((G, pmax), -1, dtype=np.int64)
    for g in range(G):
        sel = np.flatnonzero(period_group == g)  # chronological (periods sorted by key)
        idx[g, : len(sel)] = sel
    idx_j = jnp.asarray(idx)
    y = jnp.where(idx_j >= 0, pm[..., jnp.clip(idx_j, 0, pm.shape[-1] - 1)], jnp.nan)  # [..., G, Pmax]
    t = jnp.arange(pmax, dtype=y.dtype)  # position within the group's period list
    vals = linregress_field(y, t, output)
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    gi = group.indexes(da.time)
    res = grouped_var(vals, bdims, bcoords, gi, name="trend")
    if gi.prop == "group":
        res = DataArray(np.asarray(res.data)[..., 0], bdims, bcoords, res.attrs, res.name)
    res.attrs["units"] = f"{da.units}/year" if output == "slope" else ""
    return res


def _return_value(da, *, period=20, op="max", method="ML", group="time"):
    """T-year return value from a GEV fit on annual extremes (reference
    properties.py:1258-1307).

    Every method runs batched on device: ML/PWM/MM via
    ``ops.fitting.gev_fit_{ml,pwm,mm}``, APP via its closed form — no
    per-site host loop anywhere."""
    dac = da.move_dim_last("time")
    x = np.asarray(dac.data)
    gather, _ = period_blocks(da.time, "group")
    xg = np.where(gather >= 0, x[..., np.clip(gather, 0, x.shape[-1] - 1)], np.nan)
    with np.errstate(all="ignore"):
        extremes = np.nanmax(xg, axis=-1) if op == "max" else np.nanmin(xg, axis=-1)
    q = 1 - 1.0 / period if op == "max" else 1.0 / period

    if method in ("ML", "PWM", "MM"):
        from .ops.fitting import gev_fit_ml, gev_fit_mm, gev_fit_pwm, gev_ppf

        fit = {"ML": gev_fit_ml, "PWM": gev_fit_pwm, "MM": gev_fit_mm}[method]
        c, loc, scale = fit(jnp.asarray(extremes))
        vals = np.asarray(gev_ppf(q, c, loc, scale))
    elif method == "APP":
        # the reference's closed-form start IS the approximate fit
        # (utils.py:1172-1185 + 1234-1236): c=0.1, Gumbel-moment loc/scale
        from .ops.fitting import gev_ppf

        with np.errstate(all="ignore"):
            m = np.nanmean(extremes, axis=-1)
            v = np.nanvar(extremes, axis=-1)
        s = np.sqrt(6 * v) / np.pi
        n_valid = np.sum(~np.isnan(extremes), axis=-1)
        c = np.where(n_valid < 2, np.nan, 0.1)
        vals = np.asarray(gev_ppf(q, jnp.asarray(c), jnp.asarray(m - 0.57722 * s), jnp.asarray(s)))
    else:
        raise ValueError(f"Unknown return_value fitting method {method!r} (ML, PWM, MM, APP).")
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    return DataArray(vals, bdims, bcoords, {"units": da.units}, "return_value")


# -- multivariate / spatial -------------------------------------------------


def _corr_btw_var(da1, da2, *, corr_type="Spearman", group="time", output="correlation"):
    """Correlation between two variables (reference properties.py:759-827)."""
    from .ops.rank import average_rank

    gi = group.indexes(da1.time)
    x = jnp.asarray(da1.move_dim_last("time").data)
    y = jnp.asarray(da2.move_dim_last("time").data)
    xg = gather_groups(x, gi.gather_idx)
    yg = gather_groups(y, gi.gather_idx)
    if corr_type == "Spearman":
        xg = average_rank(xg, axis=-1)
        yg = average_rank(yg, axis=-1)
    elif corr_type != "Pearson":
        raise ValueError(f"corr_type must be Spearman or Pearson, got {corr_type}")

    m = ~jnp.isnan(xg) & ~jnp.isnan(yg)
    n = jnp.sum(m, axis=-1)
    x0 = jnp.where(m, xg, 0.0)
    y0 = jnp.where(m, yg, 0.0)
    mx = jnp.sum(x0, axis=-1, keepdims=True) / jnp.maximum(n[..., None], 1)
    my = jnp.sum(y0, axis=-1, keepdims=True) / jnp.maximum(n[..., None], 1)
    xc = jnp.where(m, xg - mx, 0.0)
    yc = jnp.where(m, yg - my, 0.0)
    r = jnp.sum(xc * yc, axis=-1) / jnp.sqrt(jnp.sum(xc * xc, axis=-1) * jnp.sum(yc * yc, axis=-1))

    if output == "pvalue":
        # two-sided t-approximation, the same test scipy's pearsonr /
        # spearmanr (default method) apply: t = r sqrt((n-2)/(1-r^2))
        import jax

        df = jnp.maximum(n - 2, 1).astype(r.dtype)
        t2 = df * r * r / jnp.maximum(1.0 - r * r, jnp.finfo(r.dtype).tiny)
        p = jax.scipy.special.betainc(df / 2.0, 0.5, df / (df + t2))
        r = jnp.where(n > 2, p, jnp.nan)
    elif output != "correlation":
        raise ValueError(f"output must be 'correlation' or 'pvalue', got {output!r}")

    dac = da1.move_dim_last("time")
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    res = grouped_var(r, bdims, bcoords, gi, name="corr_btw_var")
    if gi.prop == "group":
        res = DataArray(jnp.asarray(res.data)[..., 0], bdims, bcoords, res.attrs, res.name)
    res.attrs["units"] = ""
    return res


def pairwise_haversine(lon, lat):
    """All-pairs great-circle distances in km (reference nbutils.py:419-445)."""
    lon = jnp.deg2rad(jnp.asarray(lon))
    lat = jnp.deg2rad(jnp.asarray(lat))
    dlon = lon[None, :] - lon[:, None]
    a = (jnp.cos(lat[None, :]) * jnp.sin(dlon)) ** 2 + (
        jnp.cos(lat[:, None]) * jnp.sin(lat[None, :])
        - jnp.sin(lat[:, None]) * jnp.cos(lat[None, :]) * jnp.cos(dlon)
    ) ** 2
    b = jnp.sin(lat[:, None]) * jnp.sin(lat[None, :]) + jnp.cos(lat[:, None]) * jnp.cos(lat[None, :]) * jnp.cos(dlon)
    return 6367 * jnp.arctan2(jnp.sqrt(a), b)


def _pairwise_spearman(x):
    """Inter-site Spearman correlation matrix; x [N, T] (reference
    utils.py:977-1025)."""
    from .ops.rank import average_rank

    r = average_rank(x, axis=-1)
    r = r - jnp.nanmean(r, axis=-1, keepdims=True)
    r0 = jnp.where(jnp.isnan(r), 0.0, r)
    cov = r0 @ r0.T
    d = jnp.sqrt(jnp.diagonal(cov))
    return cov / (d[:, None] * d[None, :])


def _spatial_correlogram(da, *, dims=None, bins=100, group="time", method=1):
    """Mean inter-site Spearman correlation binned by distance (reference
    properties.py:1321-1409).  Requires ``lon``/``lat`` coords on the site dim."""
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data).reshape(-1, dac.shape[-1])
    lon = np.asarray(da.coords["lon"]).ravel()
    lat = np.asarray(da.coords["lat"]).ravel()
    dists = pairwise_haversine(lon, lat)
    corr = _pairwise_spearman(x)
    dmax = float(jnp.nanmax(dists))
    dmin = float(jnp.nanmin(jnp.where(dists == 0, jnp.nan, dists)))
    edges = np.linspace(dmin, dmax, bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    iu = np.triu_indices(dists.shape[0], k=1)
    dv = np.asarray(dists)[iu]
    cv = np.asarray(corr)[iu]
    which = np.clip(np.digitize(dv, edges) - 1, 0, bins - 1)
    sums = np.bincount(which, weights=np.nan_to_num(cv), minlength=bins)
    cnts = np.bincount(which, weights=(~np.isnan(cv)).astype(float), minlength=bins)
    vals = np.where(cnts > 0, sums / np.where(cnts == 0, 1, cnts), np.nan)
    return DataArray(vals, ("distance_bins",), {"distance_bins": centers}, {"units": ""}, "spatial_correlogram")


def _decorrelation_length(da, *, radius=300, thresh=0.50, dims=None, bins=100, group="time"):
    """Distance at which inter-site correlation drops below ``thresh``
    within ``radius`` (reference properties.py:1412-1537)."""
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data).reshape(-1, dac.shape[-1])
    lon = np.asarray(da.coords["lon"]).ravel()
    lat = np.asarray(da.coords["lat"]).ravel()
    dists = np.asarray(pairwise_haversine(lon, lat))
    corr = np.asarray(_pairwise_spearman(x))
    edges = np.linspace(0, radius, bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    N = dists.shape[0]
    # all-rows binning in one pass: flat (row, bin) bincount over the masked
    # pairs (the former per-row python loop was O(N) interpreter iterations)
    m = (dists > 0) & (dists <= radius)
    which = np.clip(np.digitize(dists, edges) - 1, 0, bins - 1)
    rows = np.broadcast_to(np.arange(N)[:, None], dists.shape)
    flat = (rows * bins + which)[m]
    sums = np.bincount(flat, weights=np.nan_to_num(corr)[m], minlength=N * bins).reshape(N, bins)
    cnts = np.bincount(flat, weights=(~np.isnan(corr))[m].astype(float), minlength=N * bins).reshape(N, bins)
    prof = np.where(cnts > 0, sums / np.where(cnts == 0, 1, cnts), np.nan)
    with np.errstate(invalid="ignore"):
        below = prof < thresh
    first = np.argmax(below, axis=1)
    out = np.where(below.any(axis=1), centers[first], radius)
    out = np.where(m.any(axis=1), out, np.nan)
    return DataArray(out, ("site",), {}, {"units": "km"}, "decorrelation_length")


def _spectral_variance(da, *, wavelength_range=None, dims=("lat", "lon"), delta=None, group="time"):
    """Mean DCT spectral variance over a normalized wavenumber band
    (reference properties.py:1557-1649)."""
    from .processing import _dct2

    x = jnp.asarray(da.data)
    axes = [da.dims.index(d) for d in dims]
    coeffs = x
    for a in axes:
        coeffs = _dct2(coeffs, a)
    var2 = coeffs**2
    alpha2 = jnp.zeros(tuple(x.shape[a] for a in axes))
    for pos, a in enumerate(axes):
        N = x.shape[a]
        shape = [1] * len(axes)
        shape[pos] = N
        alpha2 = alpha2 + ((jnp.arange(N) / N) ** 2).reshape(shape)
    alpha = jnp.sqrt(alpha2)
    if wavelength_range is not None and delta is not None:
        from .utils.units import str2quantity

        d = str2quantity(delta).to("m").magnitude
        lam0 = str2quantity(wavelength_range[0]).to("m").magnitude
        lam1 = str2quantity(wavelength_range[1]).to("m").magnitude
        lo, hi = 2 * d / lam0, 2 * d / lam1
        lo, hi = min(lo, hi), max(lo, hi)
    else:
        lo, hi = 0.0, 1.0
    full = [1] * x.ndim
    for pos, a in enumerate(axes):
        full[a] = x.shape[a]
    mask = ((alpha >= lo) & (alpha <= hi)).reshape(full)
    out = jnp.sum(jnp.where(mask, var2, 0.0), axis=tuple(axes)) / jnp.maximum(mask.sum(), 1)
    bdims = tuple(d for d in da.dims if d not in dims)
    bcoords = {d: da.coords[d] for d in bdims if d in da.coords}
    return DataArray(out, bdims, bcoords, {"units": f"({da.units})2" if da.units else ""}, "spectral_variance")


spell_length_distribution = StatisticalProperty("spell_length_distribution", "temporal", _spell_length_distribution, allowed_groups=["group", "season", "month"])
acf = StatisticalProperty("acf", "temporal", _acf, allowed_groups=["season", "month"])
annual_cycle_amplitude = StatisticalProperty("annual_cycle_amplitude", "temporal", lambda da, **kw: _annual_cycle(da, stat="absamp", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"])
relative_annual_cycle_amplitude = StatisticalProperty("relative_annual_cycle_amplitude", "temporal", lambda da, **kw: _annual_cycle(da, stat="relamp", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"], measure="ratio")
annual_cycle_phase = StatisticalProperty("annual_cycle_phase", "temporal", lambda da, **kw: _annual_cycle(da, stat="phase", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"], measure="circular_bias")
annual_cycle_asymmetry = StatisticalProperty("annual_cycle_asymmetry", "temporal", lambda da, **kw: _annual_cycle(da, stat="asymmetry", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"])
annual_cycle_minimum = StatisticalProperty("annual_cycle_minimum", "temporal", lambda da, **kw: _annual_cycle(da, stat="min", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"])
annual_cycle_maximum = StatisticalProperty("annual_cycle_maximum", "temporal", lambda da, **kw: _annual_cycle(da, stat="max", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"])
mean_annual_range = StatisticalProperty("mean_annual_range", "temporal", lambda da, **kw: _annual_statistic(da, stat="absamp", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"])
mean_annual_relative_range = StatisticalProperty("mean_annual_relative_range", "temporal", lambda da, **kw: _annual_statistic(da, stat="relamp", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"], measure="ratio")
mean_annual_phase = StatisticalProperty("mean_annual_phase", "temporal", lambda da, **kw: _annual_statistic(da, stat="phase", **{k: v for k, v in kw.items() if k != "stat"}), allowed_groups=["group"], measure="circular_bias")
relative_frequency = StatisticalProperty("relative_frequency", "temporal", _relative_frequency)
transition_probability = StatisticalProperty("transition_probability", "temporal", _transition_probability)
trend = StatisticalProperty("trend", "temporal", _trend)
return_value = StatisticalProperty("return_value", "temporal", _return_value, allowed_groups=["group"])
corr_btw_var = StatisticalProperty("corr_btw_var", "multivariate", _corr_btw_var)
spatial_correlogram = StatisticalProperty("spatial_correlogram", "spatial", _spatial_correlogram, allowed_groups=["group"])
decorrelation_length = StatisticalProperty("decorrelation_length", "spatial", _decorrelation_length, allowed_groups=["group"])
spectral_variance = StatisticalProperty("spectral_variance", "spatial", _spectral_variance, allowed_groups=["group"])


def _make_cond(da, method, op, thresh):
    dac = da.move_dim_last("time")
    x = jnp.asarray(dac.data)
    if method == "amount":
        t = convert_units_to(thresh, da.units)
    elif method == "quantile":
        t = jnp.nanquantile(x, float(thresh), axis=-1, keepdims=True)
    else:
        raise ValueError(f"Unknown method {method!r}")
    return _OPS[op](x, t), dac


def _periods_to_groups(per_period, period_group, group, da, stat, name, units):
    G = group.n_groups(da.time)
    out = jnp.stack(
        [_stat_reduce(jnp.where(jnp.isnan(per_period[..., np.flatnonzero(period_group == g)]), -1, per_period[..., np.flatnonzero(period_group == g)]), stat, axis=-1) for g in range(G)],
        axis=-1,
    )
    dac = da.move_dim_last("time")
    bdims = dac.dims[:-1]
    bcoords = {d: dac.coords[d] for d in bdims if d in dac.coords}
    gi = group.indexes(da.time)
    res = grouped_var(out, bdims, bcoords, gi, name=name)
    if gi.prop == "group":
        res = DataArray(jnp.asarray(res.data)[..., 0], bdims, bcoords, res.attrs, res.name)
    res.attrs["units"] = units
    return res


def _threshold_count(da, *, method="amount", op=">=", thresh="1 mm d-1", stat="mean",
                     stat_resample=None, group="time"):
    """{stat} number of days per period meeting the condition (reference
    properties.py:422-482)."""
    stat_resample = stat_resample or "sum"
    cond, _ = _make_cond(da, method, op, thresh)
    gather, period_group = period_blocks(da.time, group.prop)
    condp = jnp.where(gather >= 0, cond[..., jnp.clip(gather, 0, cond.shape[-1] - 1)], False)
    counts = jnp.sum(condp, axis=-1).astype(jnp.float32)
    return _periods_to_groups(counts, period_group, group, da, stat, "threshold_count", "d")


def _bivariate_spell_length_distribution(da1, da2, *, method1="amount", method2="amount",
                                         op1=">=", op2=">=", thresh1="1 mm d-1",
                                         thresh2="1 mm d-1", window=1, stat="mean",
                                         stat_resample=None, group="time"):
    """Spell lengths where BOTH variables' conditions hold (reference
    properties.py:830-977)."""
    stat_resample = stat_resample or stat
    cond1, _ = _make_cond(da1, method1, op1, thresh1)
    cond2, _ = _make_cond(da2, method2, op2, thresh2)
    cond = cond1 & cond2
    gather, period_group = period_blocks(da1.time, group.prop)
    condp = jnp.where(gather >= 0, cond[..., jnp.clip(gather, 0, cond.shape[-1] - 1)], False)
    lengths = _run_lengths(condp).astype(jnp.float32)
    lengths = jnp.where((lengths > 0) & (lengths < window), -1, lengths)
    per_period = _stat_reduce(lengths, stat_resample, axis=-1)
    return _periods_to_groups(per_period, period_group, group, da1, stat, "bivariate_spell_length_distribution", "d")


def _bivariate_threshold_count(da1, da2, *, method1="amount", method2="amount",
                               op1=">=", op2=">=", thresh1="1 mm d-1",
                               thresh2="1 mm d-1", stat="mean",
                               stat_resample=None, group="time"):
    """Statistic of the number of time steps where both variables meet their
    conditions — ``bivariate_spell_length_distribution`` with ``window=1``
    (reference properties.py:981-1069)."""
    return _bivariate_spell_length_distribution(
        da1, da2, method1=method1, method2=method2, op1=op1, op2=op2,
        thresh1=thresh1, thresh2=thresh2, window=1, stat=stat,
        stat_resample=stat_resample, group=group,
    ).rename("bivariate_threshold_count")


def _first_eof(da, *, dims=None, kind="+", thresh=None, group="time"):
    """First Empirical Orthogonal Function over the spatial dims.

    The reference permanently removed this property over an eofs-package
    licensing issue (reference properties.py:1540-1554); this is an original
    SVD-based reimplementation (``ops.pca.first_eof_pattern``), so there is
    no reference behavior to match.  Contract:

    - ``dims``: spatial dims to take the EOF over (default: every non-time
      dim); any other non-time dim is carried as a batch dim.
    - ``kind``: "+" analyses additive anomalies ``x - mean_t(x)``; "*"
      analyses relative anomalies ``x / mean_t(x) - 1`` (sites whose
      temporal mean is 0 or non-finite come back NaN).
    - ``thresh``: optional Quantified; values below it are treated as
      missing before the analysis (precipitation-style masking).  Missing
      entries contribute zero anomaly; all-missing sites come back NaN.

    Output: the leading EOF pattern over ``dims`` (unit L2 norm, largest
    loading positive, dimensionless), with the explained-variance fraction
    in ``attrs["variance_fraction"]`` when there are no batch dims.
    """
    from .ops.pca import first_eof_pattern

    dims = [d for d in da.dims if d != "time"] if dims is None else list(dims)
    bdims = tuple(d for d in da.dims if d != "time" and d not in dims)
    dac = da.transpose(*bdims, *dims, "time")
    x = jnp.asarray(dac.data)
    if thresh is not None:
        t = convert_units_to(thresh, da.units)
        x = jnp.where(x >= t, x, jnp.nan)
    bshape = x.shape[: len(bdims)]
    sshape = x.shape[len(bdims) : -1]
    S = int(np.prod(sshape)) if sshape else 1
    a = jnp.swapaxes(x.reshape(bshape + (S, x.shape[-1])), -1, -2)  # [..., T, S]
    mean = jnp.nanmean(a, axis=-2, keepdims=True)
    if kind == "*":
        mean = jnp.where(jnp.isfinite(mean) & (mean != 0), mean, jnp.nan)
        anom = a / mean - 1.0
    else:
        anom = a - mean
    v, var_frac = first_eof_pattern(anom)
    out = np.asarray(v).reshape(bshape + sshape)
    bcoords = {d: dac.coords[d] for d in bdims + tuple(dims) if d in dac.coords}
    res = DataArray(out, bdims + tuple(dims), bcoords, {"units": ""}, "first_eof")
    if not bdims:
        res.attrs["variance_fraction"] = float(var_frac)
    return res


threshold_count = StatisticalProperty("threshold_count", "temporal", _threshold_count, allowed_groups=["group", "season", "month"])
bivariate_spell_length_distribution = StatisticalProperty("bivariate_spell_length_distribution", "temporal", _bivariate_spell_length_distribution, allowed_groups=["group", "season", "month"])
bivariate_threshold_count = StatisticalProperty("bivariate_threshold_count", "multivariate", _bivariate_threshold_count, allowed_groups=["group", "season", "month"])
first_eof = StatisticalProperty("first_eof", "spatial", _first_eof, allowed_groups=["group"])
__all__ += ["bivariate_spell_length_distribution", "bivariate_threshold_count", "first_eof", "threshold_count"]
