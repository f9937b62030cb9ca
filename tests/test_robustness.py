"""Cross-cutting robustness: 3-D grids, NaN handling, bounded-variable
pipelines — the shapes real workflows feed in."""

import numpy as np
import pytest
from scipy import stats

import xsdba_tpu as xt
from xsdba_tpu.processing import from_additive_space, jitter_under_thresh, to_additive_space


def test_eqm_on_lat_lon_grid(random):
    """(lat, lon, time) gridded inputs flow through train/adjust."""
    nlat, nlon, nt = 3, 4, 365 * 3
    t = xt.date_range("2000-01-01", periods=nt, freq="D", calendar="noleap")
    mk = lambda loc: xt.DataArray(
        random.normal(loc, 1, (nlat, nlon, nt)),
        ("lat", "lon", "time"),
        {"time": t, "lat": np.arange(nlat), "lon": np.arange(nlon)},
        {"units": "K"},
        "tas",
    )
    ref, hist = mk(10), mk(12)
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time.month", nquantiles=15)
    assert eqm.ds["af"].dims == ("lat", "lon", "month", "quantiles")
    scen = eqm.adjust(hist, interp="linear")
    assert scen.dims == ("lat", "lon", "time")
    assert np.asarray(scen.data).mean() == pytest.approx(10, abs=0.1)


def test_time_first_layout(random):
    """(time, site) layout — time not last — must work identically."""
    nt, ns = 730, 3
    t = xt.date_range("2000-01-01", periods=nt, freq="D", calendar="noleap")
    data_r = random.normal(10, 1, (nt, ns))
    data_h = data_r + 2
    mk = lambda v: xt.DataArray(v, ("time", "site"), {"time": t}, {"units": "K"}, "tas")
    eqm = xt.EmpiricalQuantileMapping.train(mk(data_r), mk(data_h), nquantiles=10)
    scen = eqm.adjust(mk(data_h), interp="linear")
    assert scen.dims == ("time", "site")
    np.testing.assert_allclose(np.asarray(scen.data), data_r, atol=0.2)


def test_nan_inputs_propagate(random):
    """NaNs in inputs survive train (skipped) and map to NaN in scen."""
    n = 365 * 4
    u = random.random(n)
    ref_v = stats.norm.ppf(u, 10, 1)
    hist_v = stats.norm.ppf(u, 12, 2)
    hist_v[100:150] = np.nan
    ref_v[200:220] = np.nan
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    mk = lambda v: xt.DataArray(v, ("time",), {"time": t}, {"units": "K"}, "tas")
    eqm = xt.EmpiricalQuantileMapping.train(mk(ref_v), mk(hist_v), group="time.month", nquantiles=20)
    assert np.isfinite(np.asarray(eqm.ds["af"].data)).all()
    scen = eqm.adjust(mk(hist_v), interp="linear")
    sv = np.asarray(scen.data)
    assert np.isnan(sv[100:150]).all()
    ok = ~np.isnan(hist_v)
    assert np.isfinite(sv[ok]).all()


def test_additive_space_pipeline(random):
    """Bounded variable: logit-space EQM keeps outputs inside the bounds."""
    n = 365 * 4
    u = random.random(n)
    ref_v = stats.beta.ppf(u, 2, 2)
    hist_v = stats.beta.ppf(u, 4, 2)
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    mk = lambda v: xt.DataArray(v, ("time",), {"time": t}, {"units": "1"}, "hurs")
    ref_a = to_additive_space(mk(ref_v), lower_bound="0 1", upper_bound="1 1", trans="logit")
    hist_a = to_additive_space(mk(hist_v), lower_bound="0 1", upper_bound="1 1", trans="logit")
    eqm = xt.EmpiricalQuantileMapping.train(ref_a, hist_a, nquantiles=30)
    scen_a = eqm.adjust(hist_a, interp="linear")
    # restore the transform attrs (adjust drops/overwrites history only)
    for k in ("xsdba_transform", "xsdba_transform_lower", "xsdba_transform_upper", "xsdba_transform_units"):
        scen_a.attrs[k] = hist_a.attrs[k]
    scen = from_additive_space(scen_a)
    sv = np.asarray(scen.data)
    assert (sv > 0).all() and (sv < 1).all()
    interior = (hist_v > np.quantile(hist_v, 0.02)) & (hist_v < np.quantile(hist_v, 0.98))
    np.testing.assert_allclose(sv[interior], ref_v[interior], atol=0.05)


def test_jitter_then_multiplicative(random):
    """Zero-inflated precip: jitter prevents division blowups in '*' EQM."""
    n = 3650
    u = random.random(n)
    ref_v = np.where(u < 0.4, 0.0, stats.gamma.ppf(np.clip((u - 0.4) / 0.6, 0, 1 - 1e-12), 2, scale=2))
    hist_v = ref_v * 0.5
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    mk = lambda v: xt.DataArray(v, ("time",), {"time": t}, {"units": "mm/d"}, "pr")
    ref = jitter_under_thresh(mk(ref_v), "0.05 mm/d")
    hist = jitter_under_thresh(mk(hist_v), "0.05 mm/d")
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, kind="*", nquantiles=30)
    scen = eqm.adjust(hist, interp="linear")
    sv = np.asarray(scen.data)
    assert np.isfinite(sv).all()
    wet = ref_v > 1
    np.testing.assert_allclose(sv[wet], ref_v[wet], rtol=0.15)
