"""Tests for additive-space transforms, period stacking, spectral filter."""

import numpy as np
import pytest

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
    # standard calendar + YS windows trips the align_days guard (reference
    # base.py:1160-1178); noleap is uniform and passes
    t2 = xt.date_range("1950-01-01", periods=365 * 50 + 13, freq="D", calendar="noleap")
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


class TestStackPeriodsGeneralFreq:
    """General-frequency stack_periods (reference base.py:1072-1381)."""

    def _mk(self, periods, calendar="360_day", start="2000-01-01"):
        t = xt.date_range(start, periods=periods, freq="D", calendar=calendar)
        return xt.DataArray(np.arange(periods, dtype=float), ("time",), {"time": t}, {"units": "K"}, "x")

    def test_quarters_roundtrip(self):
        da = self._mk(360 * 8)  # 8 years of 360_day
        st = stack_periods(da, window=6, stride=2, freq="QS")  # 6 quarters, stride 2 (3 parts)
        assert st.dims == ("period", "time")
        # 32 quarters -> strides at q 0,2,...; complete windows while q+6 <= 32 -> 14
        assert st.shape[0] == 14
        assert st.shape[1] == 6 * 90
        un = unstack_periods(st)
        v = np.asarray(un.data)
        m = ~np.isnan(v)
        np.testing.assert_allclose(v[m], np.asarray(da.data)[m])
        assert m.all()  # full coverage: series is whole windows

    def test_months_roundtrip(self):
        da = self._mk(360 * 5)
        st = stack_periods(da, window=9, stride=3, freq="MS")
        un = unstack_periods(st)
        v = np.asarray(un.data)
        m = ~np.isnan(v)
        np.testing.assert_allclose(v[m], np.asarray(da.data)[m])

    def test_days_freq(self):
        da = self._mk(100, calendar="noleap")
        st = stack_periods(da, window=30, stride=10, freq="D")
        assert st.shape == (8, 30)
        un = unstack_periods(st)
        v = np.asarray(un.data)
        m = ~np.isnan(v)
        np.testing.assert_allclose(v[m], np.asarray(da.data)[m])

    def test_min_length_keeps_short_tail(self):
        da = self._mk(365 * 12, calendar="noleap")
        full = stack_periods(da, window=5, stride=5, freq="YS")
        assert full.shape[0] == 2
        with_tail = stack_periods(da, window=5, stride=5, freq="YS", min_length=2)
        assert with_tail.shape[0] == 3
        lengths = (~np.isnan(np.asarray(with_tail.data))).sum(axis=-1)
        assert lengths[-1] == 2 * 365

    def test_fractional_first_period_skipped(self):
        # series starts in February: the first annual window is fractionally
        # incomplete and must be skipped (reference base.py:1216-1224)
        da = self._mk(365 * 6, calendar="noleap", start="2000-02-01")
        st = stack_periods(da, window=2, stride=2, freq="YS")
        # the k=0 stride (anchored on the fractional year 2000) is skipped;
        # the next stride starts at 2002 (reference `continue`, not re-anchor)
        assert np.asarray(st.coords["period"])[0].startswith("2002")

    def test_raises(self):
        da = self._mk(365 * 10, calendar="standard")
        with pytest.raises(ValueError, match="Stride must be less"):
            stack_periods(da, window=2, stride=3)
        with pytest.raises(ValueError, match="unaligned day-of-year"):
            stack_periods(da, window=2, freq="YS")
        # align_days=False disables the guard
        stack_periods(da, window=2, freq="YS", align_days=False)
        danl = self._mk(365 * 10, calendar="noleap")
        with pytest.raises(ValueError, match="unaligned day-of-month"):
            stack_periods(danl, window=2, freq="QS")
        st = stack_periods(danl, window=3, stride=1, freq="YS")
        # 3/1 = 3 parts (odd) fine; now break it
        st2 = stack_periods(danl, window=4, stride=2, freq="YS")
        with pytest.raises(NotImplementedError, match="odd number"):
            unstack_periods(st2)

    def test_monthly_sampled_data(self):
        t = xt.date_range("2000-01-01", periods=12 * 20, freq="MS", calendar="noleap")
        da = xt.DataArray(np.arange(240, dtype=float), ("time",), {"time": t}, {"units": "K"}, "x")
        st = stack_periods(da, window=6, stride=2, freq="YS")
        assert st.shape == ((20 - 6) // 2 + 1, 72)
        un = unstack_periods(st)
        v = np.asarray(un.data)
        m = ~np.isnan(v)
        np.testing.assert_allclose(v[m], np.asarray(da.data)[m])
        # reconstructed time axis matches the original
        assert un.time == da.time

    def test_anchored_quarters(self):
        da = self._mk(360 * 6)
        st = stack_periods(da, window=4, stride=4, freq="QS-DEC", align_days=False)
        # first DJF quarter boundary for a Jan 1 start is Dec 1 of year 0:
        # the fragment before it is quarter "SON"-aligned... start must be on
        # a Dec/Mar/Jun/Sep month boundary
        month0 = int(np.asarray(st.coords["period"])[0][5:7])
        assert month0 in (3, 6, 9, 12)


class TestStackPeriodsFreqParity:
    """Non-start-anchored and weekly offsets (reference base.py:1072-1270
    accepts any parseable offset; end-anchored bins equal the start-anchored
    offset rooted one month later, weekly anchors are dropped as in reference
    parse_offset base.py:969-973)."""

    @staticmethod
    def _series(calendar="noleap", n=365 * 8 + 2, start="2000-01-03"):
        t = xt.date_range(start, periods=n, freq="D", calendar=calendar)
        return xt.DataArray(np.arange(float(n)), ("time",), {"time": t}, {"units": "K"}, "x")

    def test_end_anchored_year_starts_next_month(self):
        da = self._series()
        s = stack_periods(da, window=2, stride=2, freq="YE-JUN")
        tt = da.time
        for st, _ in s.attrs["_stack_periods"]["segments"]:
            assert (int(tt.month[st]), int(tt.day[st])) == (7, 1)

    @pytest.mark.parametrize(
        "freq_e,freq_s,window",
        [("YE", "YS", 2), ("QE-DEC", "QS", 2), ("ME", "MS", 3)],
    )
    def test_end_anchored_bins_equal_start_equivalent(self, freq_e, freq_s, window):
        da = self._series(calendar="360_day", n=360 * 6, start="2000-01-01")
        s1 = stack_periods(da, window=window, stride=window, freq=freq_e)
        s2 = stack_periods(da, window=window, stride=window, freq=freq_s)
        assert s1.attrs["_stack_periods"]["segments"] == s2.attrs["_stack_periods"]["segments"]

    @pytest.mark.parametrize("freq", ["W", "W-MON", "2W"])
    def test_weekly_roundtrip(self, freq):
        da = self._series()
        s = stack_periods(da, window=9, stride=3, freq=freq)
        u = unstack_periods(s)
        covered = ~np.isnan(np.asarray(u.data))
        assert covered.any()
        assert np.array_equal(np.asarray(u.data)[covered], np.asarray(da.data)[covered])

    def test_end_anchored_overlapping_roundtrip(self):
        da = self._series()
        s = stack_periods(da, window=3, stride=1, freq="YE-JUN")
        u = unstack_periods(s)
        covered = ~np.isnan(np.asarray(u.data))
        assert np.array_equal(np.asarray(u.data)[covered], np.asarray(da.data)[covered])
