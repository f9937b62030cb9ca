"""Tests for additive-space transforms, period stacking, spectral filter."""

import numpy as np

import xsdba_tpu as xt
from xsdba_tpu.processing import (
    from_additive_space,
    grouped_time_indexes,
    spectral_filter,
    stack_periods,
    to_additive_space,
    unstack_periods,
)


def test_additive_space_log_roundtrip(random):
    t = xt.date_range("2000-01-01", periods=100, freq="D")
    pr = xt.DataArray(random.gamma(2, 2, 100) + 0.01, ("time",), {"time": t}, {"units": "mm/d"}, "pr")
    y = to_additive_space(pr, lower_bound="0 mm/d", trans="log")
    assert y.attrs["units"] == "" and y.attrs["xsdba_transform"] == "log"
    back = from_additive_space(y)
    assert back.attrs["units"] == "mm/d"
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(pr.data), rtol=1e-12)


def test_additive_space_logit_roundtrip(random):
    t = xt.date_range("2000-01-01", periods=100, freq="D")
    hus = xt.DataArray(random.uniform(0.1, 0.9, 100), ("time",), {"time": t}, {"units": "1"}, "hus")
    y2 = to_additive_space(hus, lower_bound="0 1", upper_bound="1 1", trans="logit")
    back2 = from_additive_space(y2)
    np.testing.assert_allclose(np.asarray(back2.data), np.asarray(hus.data), rtol=1e-10)


def test_stack_periods_roundtrip():
    t2 = xt.date_range("1950-01-01", periods=365 * 50 + 13, freq="D")
    da = xt.DataArray(np.arange(len(t2), dtype=float), ("time",), {"time": t2}, {"units": "K"}, "tas")
    st = stack_periods(da, window=30, stride=10)
    assert st.dims == ("period", "time")
    assert st.shape[0] == 3
    un = unstack_periods(st)
    v = np.asarray(un.data)
    orig = np.asarray(da.data)
    m = ~np.isnan(v)
    np.testing.assert_allclose(v[m], orig[m])
    # everything inside the complete windows is covered
    assert np.isnan(v).sum() <= 366


def test_stack_periods_no_overlap():
    t = xt.date_range("2000-01-01", periods=365 * 12, freq="D", calendar="noleap")
    da = xt.DataArray(np.arange(365 * 12, dtype=float), ("time",), {"time": t}, {"units": "K"}, "tas")
    st = stack_periods(da, window=5)
    assert st.shape[0] == 2  # 12 years -> two complete 5-year windows... plus?
    un = unstack_periods(st)
    v = np.asarray(un.data)
    np.testing.assert_allclose(v[~np.isnan(v)], np.asarray(da.data)[~np.isnan(v)])


def test_spectral_filter_removes_noise():
    x, yy = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
    smooth = np.sin(2 * np.pi * x) * np.cos(2 * np.pi * yy)
    noise = 0.3 * np.sin(60 * np.pi * x)
    field = xt.DataArray(smooth + noise, ("lat", "lon"), {}, {"units": "K"}, "tas")
    filt = spectral_filter(field, ["lat", "lon"], alpha_low_high=(0.1, 0.3))
    err_filtered = np.abs(np.asarray(filt.data) - smooth).mean()
    assert err_filtered < 0.25 * np.abs(noise).mean()


def test_grouped_time_indexes():
    t = xt.date_range("2001-01-01", periods=365 * 2, freq="D", calendar="noleap")
    g_idxs, gw_idxs = grouped_time_indexes(t, xt.Grouper("time.dayofyear", window=5))
    assert g_idxs.shape[0] == 365
    assert gw_idxs.shape[1] == 5 * g_idxs.shape[1]
