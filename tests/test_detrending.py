import numpy as np
import pytest

from xsdba_tpu import DataArray, date_range
from xsdba_tpu.detrending import LoessDetrend, MeanDetrend, NoDetrend, PolyDetrend, RollingMeanDetrend
from xsdba_tpu.ops.detrend import polyfit_trend
from xsdba_tpu.ops.loess import loess_smoothing


def series(values, units="K"):
    t = date_range("2000-01-01", periods=np.shape(values)[-1], freq="D")
    dims = ("time",) if np.ndim(values) == 1 else ("site", "time")
    return DataArray(np.asarray(values, dtype=np.float64), dims, {"time": t}, {"units": units}, "tas")


def test_polyfit_matches_numpy(random):
    x = np.linspace(0, 10, 500)
    y = 3 + 0.5 * x - 0.02 * x**2 + random.normal(0, 0.1, (4, 500))
    got = np.asarray(polyfit_trend(y, x, degree=2))
    for i in range(4):
        want = np.polyval(np.polyfit(x, y[i], 2), x)
        np.testing.assert_allclose(got[i], want, rtol=1e-8, atol=1e-8)


def test_polyfit_nan_aware(random):
    x = np.arange(300.0)
    y = 1 + 0.1 * x + random.normal(0, 0.5, 300)
    y[50:60] = np.nan
    got = np.asarray(polyfit_trend(y, x, degree=1))
    m = ~np.isnan(y)
    want = np.polyval(np.polyfit(x[m], y[m], 1), x)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_poly_detrend_roundtrip(random):
    n = 365 * 4
    trend_true = 10 + 0.004 * np.arange(n)
    y = trend_true + random.normal(0, 0.3, n)
    da = series(y)
    det = PolyDetrend(degree=1).fit(da)
    detrended = det.detrend(da)
    # detrended series has no trend left
    slope = np.polyfit(np.arange(n), np.asarray(detrended.data), 1)[0]
    assert abs(slope) < 1e-5
    # retrend restores the original exactly
    back = det.retrend(detrended)
    np.testing.assert_allclose(np.asarray(back.data), y, rtol=1e-10)


def test_poly_detrend_multiplicative(random):
    n = 1000
    y = (5 + 0.01 * np.arange(n)) * np.exp(random.normal(0, 0.02, n))
    da = series(y, units="mm/d")
    det = PolyDetrend(degree=1, kind="*").fit(da)
    d = det.detrend(da)
    back = det.retrend(d)
    np.testing.assert_allclose(np.asarray(back.data), y, rtol=1e-10)


def test_no_and_mean_detrend(random):
    y = 5 + random.normal(0, 1, 400)
    da = series(y)
    nd = NoDetrend().fit(da)
    np.testing.assert_array_equal(np.asarray(nd.detrend(da).data), y)
    md = MeanDetrend().fit(da)
    np.testing.assert_allclose(np.asarray(md.ds["trend"].data), y.mean(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(md.detrend(da).data), y - y.mean(), rtol=1e-9, atol=1e-12)


def _loess_reference(x, y, f, niter, d, weights):
    """Plain-numpy port of Cleveland's algorithm with the reference's
    equal-spacing window rules (loess.py:108-155) for parity testing."""
    n = len(x)
    dx = x[1] - x[0]
    r = int(2 * (int(f * n) // 2) + 1)
    hw = (r - 1) // 2
    R = min(r + 4, n)
    HW = hw + 2
    wf = (lambda u: np.where(u >= 1, 0, (1 - u**3) ** 3)) if weights == "tricube" else (
        lambda u: np.where(u >= 1, 0, np.exp(-(u**2) / (2 * (1 / 1.96) ** 2)))
    )
    yest = np.zeros(n)
    delta = np.ones(n)
    for it in range(niter):
        for i in range(n):
            s = min(max(i - HW, 0), n - R)
            xi, yi, di = x[s : s + R], y[s : s + R], delta[s : s + R]
            if i < hw:
                h = (r - i) * dx
            elif i >= n - hw:
                h = (i - (n - r) + 1) * dx
            else:
                h = (hw + 1) * dx
            w = di * wf(np.abs(xi - x[i]) / h)
            if d == 0:
                yest[i] = (w * yi).sum() / w.sum()
            else:
                b = np.array([np.sum(w * yi), np.sum(w * yi * xi)])
                A = np.array([[np.sum(w), np.sum(w * xi)], [np.sum(w * xi), np.sum(w * xi * xi)]])
                beta = np.linalg.solve(A, b)
                yest[i] = beta[0] + beta[1] * x[i]
        if it < niter - 1:
            res = y - yest
            s_ = np.median(np.abs(res))
            xres = (res != 0) * 1.0 if s_ == 0 else res / (6 * s_)
            delta = (1 - xres**2) ** 2
            delta[np.abs(xres) >= 1] = 0
    return yest


@pytest.mark.parametrize("d", [0, 1])
@pytest.mark.parametrize("weights", ["tricube", "gaussian"])
def test_loess_matches_reference_algorithm(random, d, weights):
    n = 200
    x = np.arange(n, dtype=np.float64)
    y = np.sin(x / 20) + random.normal(0, 0.2, n)
    got = np.asarray(loess_smoothing(y, x, f=0.3, niter=2, d=d, weights=weights))
    want = _loess_reference(x, y, 0.3, 2, d, weights)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_loess_detrend_smooths(random):
    n = 730
    trend_true = 10 + 0.01 * np.arange(n)
    y = trend_true + random.normal(0, 0.5, n)
    da = series(y)
    det = LoessDetrend(f=0.3, niter=1, d=1).fit(da)
    trend = np.asarray(det.ds["trend"].data)
    interior = slice(n // 5, -n // 5)
    np.testing.assert_allclose(trend[interior], trend_true[interior], atol=0.3)


def test_rolling_mean_detrend(random):
    n = 500
    y = 5 + random.normal(0, 1, n)
    da = series(y)
    det = RollingMeanDetrend(win=30, min_periods=1).fit(da)
    trend = np.asarray(det.ds["trend"].data)
    # interior matches a straight convolution
    want = np.convolve(y, np.ones(30) / 30, mode="same")
    np.testing.assert_allclose(trend[30:-30], want[30:-30], rtol=1e-8)
    # weighted variant
    w = np.ones(11)
    detw = RollingMeanDetrend(win=11, weights=w).fit(da)
    trw = np.asarray(detw.ds["trend"].data)
    assert np.isfinite(trw[20])


def test_dqm_cannon_2015(random):
    """DQM on Cannon 2015: mean ~41.6, std ~15.0 (reference
    tests/test_adjustment.py:434-441)."""
    from scipy import stats

    from xsdba_tpu.models import DetrendedQuantileMapping

    u = random.random(10000)
    ref = stats.gamma.ppf(u, 4, scale=7.5)
    hist = stats.gamma.ppf(u, 8.15, scale=3.68)
    sim = stats.gamma.ppf(u, 16, scale=2.63)
    r, h, s = (DataArray(v, ("time",), {"time": date_range("2000-01-01", periods=len(v), freq="D")}, {"units": "mm/d"}, "pr") for v in (ref, hist, sim))
    dqm = DetrendedQuantileMapping.train(r, h, kind="*", nquantiles=50, group="time")
    scen = dqm.adjust(s, interp="linear", detrend=1)
    sv = np.asarray(scen.data)
    assert sv.mean() == pytest.approx(41.6, rel=0.1)
    assert sv.std() == pytest.approx(15.0, rel=0.15)


def test_dqm_detrend_object(random):
    from xsdba_tpu.models import DetrendedQuantileMapping

    n = 2000
    u = random.random(n)
    from scipy import stats

    ref = stats.norm.ppf(u, 10, 1)
    hist = stats.norm.ppf(u, 12, 2)
    r = series(ref)
    h = series(hist)
    dqm = DetrendedQuantileMapping.train(r, h, nquantiles=30)
    scen = dqm.adjust(h, detrend=LoessDetrend(f=0.3, niter=1, d=0))
    sv = np.asarray(scen.data)
    assert sv.mean() == pytest.approx(10, abs=0.3)


def test_loess_detrend_warns_on_unsupported_options():
    from xsdba_tpu.detrending import LoessDetrend

    with pytest.warns(UserWarning, match="equal_spacing"):
        LoessDetrend(equal_spacing=False)
    with pytest.warns(UserWarning, match="skipna"):
        LoessDetrend(skipna=False)
