"""Public processing API tests (reference tests/test_processing.py analogues)."""

import numpy as np
import pytest

import xsdba_tpu as xt
from xsdba_tpu.processing import (
    adapt_freq,
    jitter_over_thresh,
    jitter_under_thresh,
    normalize,
    reordering,
    standardize,
    uniform_noise_like,
    unstandardize,
)


def series(values, units="K", calendar="noleap", name="tas"):
    t = xt.date_range("2000-01-01", periods=np.shape(values)[-1], freq="D", calendar=calendar)
    dims = ("time",) if np.ndim(values) == 1 else ("site", "time")
    return xt.DataArray(np.asarray(values, dtype=np.float64), dims, {"time": t}, {"units": units}, name)


def test_jitter_under(random):
    x = random.gamma(1, 1, 2000)
    x[x < 0.5] = 0.0
    da = series(x, units="mm/d", name="pr")
    out = np.asarray(jitter_under_thresh(da, "0.5 mm/d").data)
    assert (out > 0).all() and (out[x < 0.5] < 0.5).all()
    np.testing.assert_array_equal(out[x >= 0.5], x[x >= 0.5])


def test_jitter_over(random):
    x = random.gamma(2, 2, 2000)
    da = series(x, units="mm/d", name="pr")
    out = np.asarray(jitter_over_thresh(da, "10 mm/d", "15 mm/d").data)
    assert out.max() <= 15
    np.testing.assert_array_equal(out[x <= 10], x[x <= 10])


def test_adapt_freq_public(random):
    n = 5000
    u = random.random(n)
    ref_v = np.where(u < 0.3, 0.0, random.gamma(2, 2, n))
    sim_v = np.where(u < 0.6, 0.0, random.gamma(2, 2, n))
    out = adapt_freq(series(ref_v, "mm/d", name="pr"), series(sim_v, "mm/d", name="pr"), thresh="0.1 mm/d")
    assert set(out.keys()) == {"sim_ad", "pth", "dP0", "P0_ref", "P0_hist"}
    sa = np.asarray(out["sim_ad"].data)
    assert (sa < 0.1).mean() == pytest.approx((ref_v < 0.1).mean(), abs=0.02)
    assert float(np.asarray(out["dP0"].data).ravel()[0]) == pytest.approx(0.5, abs=0.05)


def test_normalize_roundtripish(random):
    n = 365 * 3
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    x = 10 + 5 * np.sin(2 * np.pi * np.arange(n) / 365) + random.normal(0, 0.5, n)
    da = series(x)
    anom, norm = normalize(da, group="time.month")
    assert norm.shape[-1] == 12
    a = np.asarray(anom.data)
    assert abs(a.mean()) < 0.05
    # kind="*"
    da2 = series(x + 20, units="mm/d", name="pr")
    anom2, norm2 = normalize(da2, group="time.month", kind="*")
    m = np.asarray(anom2.data)
    assert m.mean() == pytest.approx(1.0, abs=0.01)


def test_standardize_roundtrip(random):
    x = random.normal(5, 3, (2, 500))
    da = series(x)
    std, mu, sig = standardize(da)
    sv = np.asarray(std.data)
    np.testing.assert_allclose(sv.mean(axis=-1), 0, atol=1e-9)
    np.testing.assert_allclose(sv.std(axis=-1), 1, rtol=1e-9)
    back = unstandardize(std, mu, sig)
    np.testing.assert_allclose(np.asarray(back.data), x, rtol=1e-9)


def test_reordering(random):
    x = random.normal(size=500)
    y = random.normal(5, 2, 500)
    out = np.asarray(reordering(series(x), series(y)).data)
    # same values as y, rank order of x
    np.testing.assert_allclose(np.sort(out), np.sort(y), rtol=1e-12)
    np.testing.assert_array_equal(np.argsort(out), np.argsort(x))


def test_uniform_noise_like(random):
    da = series(np.zeros(100))
    noise = np.asarray(uniform_noise_like(da, 1e-6, 1e-3).data)
    assert noise.shape == (100,)
    assert (noise >= 1e-6).all() and (noise <= 1e-3).all()


def test_rng_reproducible():
    from xsdba_tpu.utils.rng import seed

    da = series(np.zeros(50))
    seed(123)
    a = np.asarray(uniform_noise_like(da).data)
    seed(123)
    b = np.asarray(uniform_noise_like(da).data)
    np.testing.assert_array_equal(a, b)


def test_adapt_freq_rolling_window(random):
    """Notebook scenario (advanced_example: 'Frequency adaption with a
    rolling window'): windowed doy grouping adapts the dry-day frequency."""
    from xsdba_tpu import DataArray, date_range
    from xsdba_tpu.processing import adapt_freq
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2000-01-01", periods=365 * 4, freq="D", calendar="noleap")
    pr_ref = np.where(random.random(t.size) < 0.6, 0.0, random.gamma(2, 2, t.size))
    pr_sim = np.where(random.random(t.size) < 0.8, 0.0, random.gamma(2, 2, t.size))
    mk = lambda v, n: DataArray(v, ("time",), {"time": t}, {"units": "mm/d"}, n)
    out = adapt_freq(mk(pr_ref, "ref"), mk(pr_sim, "sim"), group=Grouper("time.dayofyear", window=31), thresh="1 mm/d")
    sim_ad = np.asarray(out["sim_ad"].data)
    assert out["pth"].dims == ("dayofyear",)
    dry_ref = (pr_ref <= 1).mean()
    dry_sim = (pr_sim <= 1).mean()
    dry_ad = (sim_ad <= 1).mean()
    assert abs(dry_ad - dry_ref) < abs(dry_sim - dry_ref) * 0.25


def test_jitter_minimum_bounds_noise(random):
    """`minimum` is the lower bound of the under-threshold noise (reference
    processing.py:124-224), not machine epsilon."""
    from xsdba_tpu.processing import jitter

    x = series(np.zeros(2000), "mm/d", name="pr")
    out = np.asarray(jitter(x, lower="1 mm/d", minimum="0.5 mm/d").data)
    assert out.min() >= 0.5 and out.max() < 1.0
    assert out.std() > 0.01  # actually jittered
