"""Adjustment scheme tests, following the reference's synthetic-distribution
strategy (SURVEY §4: shared uniform samples through known distributions give
analytic expected mappings; tests/test_adjustment.py of the reference)."""

import numpy as np
import pytest
from scipy import stats

from xsdba_tpu import DataArray, date_range, set_options
from xsdba_tpu.models import LOCI, EmpiricalQuantileMapping, QuantileDeltaMapping, Scaling
from xsdba_tpu.ops.correction import equally_spaced_nodes


def series(values, name="tas", start="2000-01-01", calendar="standard", units="K"):
    t = date_range(start, periods=len(values), freq="D", calendar=calendar)
    return DataArray(np.asarray(values), ("time",), {"time": t}, {"units": units}, name)


@pytest.fixture
def cannon_2015():
    """Gamma-distributed ref/hist/sim from Cannon et al. 2015 (reference
    testing/sdba_utils.py:68-114): ref ~ G(4, 1/scale...), shared quantiles."""
    rng = np.random.default_rng(31)
    u = rng.random(10000)
    # Cannon et al. 2015 gammas (reference testing/sdba_utils.py:68-86):
    # ref ~ G(4, 7.5) mu=30 sd=15 ; hist ~ G(8.15, 3.68) mu=30 sd=10.5 ;
    # sim ~ G(16, 2.63) mu=42 sd=10.5
    ref = stats.gamma.ppf(u, 4, scale=7.5)
    hist = stats.gamma.ppf(u, 8.15, scale=3.68)
    sim = stats.gamma.ppf(u, 16, scale=2.63)
    return ref, hist, sim


class TestEQM:
    @pytest.mark.parametrize("kind,units", [("+", "K"), ("*", "mm/d")])
    def test_quantiles_additive_multiplicative(self, random, kind, units):
        """Train on shared-uniform normals/lognormals: af must match the
        analytic correction at interior quantiles (reference strategy,
        tests/test_adjustment.py:164-231)."""
        u = random.random(10000)
        if kind == "+":
            ref = stats.norm.ppf(u, loc=10, scale=1)
            hist = stats.norm.ppf(u, loc=12, scale=2)
        else:
            ref = stats.lognorm.ppf(u, 0.5, scale=np.exp(1))
            hist = stats.lognorm.ppf(u, 0.8, scale=np.exp(1.5))
        r, h = series(ref, units=units), series(hist, units=units)
        eqm = EmpiricalQuantileMapping.train(r, h, kind=kind, group="time", nquantiles=50)
        q = equally_spaced_nodes(50)
        ref_q = np.quantile(ref, q)
        hist_q = np.quantile(hist, q)
        expected = ref_q - hist_q if kind == "+" else ref_q / hist_q
        af = np.asarray(eqm.ds["af"].data)[0]
        np.testing.assert_allclose(af, expected, rtol=1e-3, atol=1e-2)

        # adjusting hist should approximately recover ref away from the tails
        # (the reference's tests likewise exclude the endpoints)
        scen = eqm.adjust(h, interp="linear")
        interior = (hist > np.quantile(hist, 0.01)) & (hist < np.quantile(hist, 0.99))
        np.testing.assert_allclose(np.asarray(scen.data)[interior], ref[interior], rtol=0.1, atol=0.1)

    def test_train_output_structure(self, random):
        u = random.random(500)
        r = series(stats.norm.ppf(u, 10, 1))
        h = series(stats.norm.ppf(u, 11, 1))
        eqm = EmpiricalQuantileMapping.train(r, h, group="time.month", nquantiles=20)
        assert eqm.ds["af"].dims == ("month", "quantiles")
        assert eqm.ds["af"].shape == (12, 20)
        np.testing.assert_array_equal(eqm.ds["af"].coords["month"], np.arange(1, 13))
        assert eqm.kind == "+"
        assert eqm.group.name == "time.month"

    def test_grouped_adjust_monthly_cycle(self, random):
        """Monthly-varying bias must be removed per month."""
        n = 365 * 4
        t = date_range("2000-01-01", periods=n, freq="D")
        base = 10 + 3 * np.sin(2 * np.pi * np.arange(n) / 365.25)
        noise = random.normal(0, 0.5, n)
        bias = (t.month >= 6) * 2.0  # +2K bias Jun-Dec
        ref = series(base + noise)
        hist = series(base + noise + bias)
        eqm = EmpiricalQuantileMapping.train(ref, hist, group="time.month", nquantiles=20)
        scen = eqm.adjust(hist, interp="nearest")
        err = np.asarray(scen.data) - (base + noise)
        assert np.abs(err).mean() < 0.2

    def test_doy_window_group(self, random):
        n = 365 * 3
        ref = series(10 + random.normal(0, 1, n), calendar="noleap")
        hist = series(12 + random.normal(0, 1, n), calendar="noleap")
        eqm = EmpiricalQuantileMapping.train(ref, hist, group="time.dayofyear", window=31, nquantiles=10)
        assert eqm.ds["af"].shape == (365, 10)
        scen = eqm.adjust(hist)
        assert abs(np.asarray(scen.data).mean() - 10) < 0.3

    def test_different_calendars_rejected(self, random):
        ref = series(random.normal(10, 1, 365), calendar="noleap")
        hist = series(random.normal(10, 1, 365), calendar="360_day")
        with pytest.raises(ValueError, match="calendar"):
            EmpiricalQuantileMapping.train(ref, hist)

    def test_different_times_rejected(self, random):
        ref = series(random.normal(10, 1, 365), start="2000-01-01")
        hist = series(random.normal(10, 1, 365), start="2001-01-01")
        with pytest.raises(ValueError, match="time"):
            EmpiricalQuantileMapping.train(ref, hist)

    def test_unit_harmonization(self, random):
        u = random.random(1000)
        ref = series(stats.norm.ppf(u, 283, 2), units="K")
        hist_c = series(stats.norm.ppf(u, 12, 2), units="degC")
        eqm = EmpiricalQuantileMapping.train(ref, hist_c)
        scen = eqm.adjust(hist_c)
        assert scen.attrs["units"] == "K"
        np.testing.assert_allclose(np.asarray(scen.data).mean(), 283, atol=0.5)

    def test_history_attrs(self, random):
        r = series(random.normal(10, 1, 365))
        h = series(random.normal(11, 1, 365))
        eqm = EmpiricalQuantileMapping.train(r, h)
        scen = eqm.adjust(h)
        assert "bias_adjustment" in scen.attrs
        assert "EmpiricalQuantileMapping" in scen.attrs["bias_adjustment"]
        assert "history" in scen.attrs

    def test_roundtrip_serialization(self, tmp_path, random):
        u = random.random(2000)
        r = series(stats.norm.ppf(u, 10, 1))
        h = series(stats.norm.ppf(u, 12, 2))
        eqm = EmpiricalQuantileMapping.train(r, h, group="time.month", nquantiles=15)
        path = str(tmp_path / "eqm.npz")
        eqm.save(path)
        from xsdba_tpu.models.base import TrainAdjust

        restored = EmpiricalQuantileMapping.from_file(path)
        assert isinstance(restored, EmpiricalQuantileMapping)
        assert restored.kind == eqm.kind and restored.group == eqm.group
        s1 = np.asarray(eqm.adjust(h).data)
        s2 = np.asarray(restored.adjust(h).data)
        np.testing.assert_allclose(s1, s2, rtol=1e-12)


class TestQDM:
    def test_cannon_2015(self, cannon_2015):
        """QDM on the Cannon 2015 setup: scen mean/std ~ 41.5/16.7 after the
        multiplicative delta (reference tests/test_adjustment.py:836-859)."""
        ref, hist, sim = cannon_2015
        r, h, s = series(ref, units="mm/d"), series(hist, units="mm/d"), series(sim, units="mm/d")
        qdm = QuantileDeltaMapping.train(r, h, kind="*", nquantiles=50, group="time")
        scen = qdm.adjust(s, interp="linear")
        sv = np.asarray(scen.data)
        assert sv.mean() == pytest.approx(41.5, rel=0.1)
        assert sv.std() == pytest.approx(16.7, rel=0.2)

    def test_quantile_delta_preserved(self, random):
        """QDM preserves relative changes: adjusting hist exactly recovers ref
        at interior points when distributions are the training ones."""
        u = random.random(5000)
        ref = stats.norm.ppf(u, 10, 1)
        hist = stats.norm.ppf(u, 15, 2)
        r, h = series(ref), series(hist)
        qdm = QuantileDeltaMapping.train(r, h, nquantiles=50)
        scen = qdm.adjust(h, interp="linear")
        interior = (hist > np.quantile(hist, 0.02)) & (hist < np.quantile(hist, 0.98))
        np.testing.assert_allclose(np.asarray(scen.data)[interior], ref[interior], atol=0.2)

    def test_extra_output(self, random):
        r = series(random.normal(10, 1, 500))
        h = series(random.normal(12, 1, 500))
        qdm = QuantileDeltaMapping.train(r, h)
        with set_options(extra_output=True):
            out = qdm.adjust(h)
        assert "sim_q" in out
        simq = np.asarray(out["sim_q"].data)
        assert simq.min() >= 0 and simq.max() <= 1

    def test_rank_window_deprecation(self, random):
        """Unset rank_window on a windowed group warns that windowed ranking
        becomes the default (reference _adjustment.py:858-871); explicit
        True/False and unwindowed groups stay silent."""
        import warnings

        n = 365 * 3
        r = series(random.normal(10, 1, n))
        h = series(random.normal(12, 1, n))
        qdm = QuantileDeltaMapping.train(r, h, group="time.month", window=3)
        with pytest.warns(DeprecationWarning, match="rank_window"):
            qdm.adjust(h)
        with warnings.catch_warnings():
            warnings.simplefilter("error", DeprecationWarning)
            qdm.adjust(h, rank_window=True)
            qdm.adjust(h, rank_window=False)
            qdm2 = QuantileDeltaMapping.train(r, h, group="time.month")
            qdm2.adjust(h)


class TestScaling:
    @pytest.mark.parametrize("kind", ["+", "*"])
    def test_simple(self, random, kind):
        n = 365 * 2
        ref = series(10 + random.normal(0, 0.1, n))
        hist = series((10 + random.normal(0, 0.1, n)) * 1.5 if kind == "*" else 12 + random.normal(0, 0.1, n))
        sc = Scaling.train(ref, hist, kind=kind, group="time")
        scen = sc.adjust(hist)
        assert np.asarray(scen.data).mean() == pytest.approx(10, abs=0.1)

    def test_monthly(self, random):
        n = 365 * 3
        t = date_range("2000-01-01", periods=n, freq="D")
        ref = series(10 + random.normal(0, 0.1, n))
        hist = series(10 + t.month * 0.5 + random.normal(0, 0.1, n))
        sc = Scaling.train(ref, hist, group="time.month")
        assert sc.ds["af"].shape == (12,)
        scen = sc.adjust(hist)
        assert abs(np.asarray(scen.data).mean() - 10) < 0.05


class TestLOCI:
    def test_wet_day_scaling(self, random):
        """LOCI on synthetic precipitation: hist = ref/2 with different wet-day
        threshold; adjusted series recovers ref's wet-day stats (reference
        tests/test_adjustment.py LOCI test design)."""
        n = 5000
        u = random.random(n)
        # half dry days, wet values spanning (0, inf) continuously
        ref_v = np.where(u < 0.5, 0.0, stats.gamma.ppf(np.clip((u - 0.5) * 2, 0, 1 - 1e-9), 2, scale=2))
        hist_v = ref_v / 2
        r = series(ref_v, units="mm/d")
        h = series(hist_v, units="mm/d")
        loci = LOCI.train(r, h, thresh="1 mm/d", group="time")
        scen = loci.adjust(h)
        sv = np.asarray(scen.data)
        wet = ref_v > 1
        np.testing.assert_allclose(sv[wet], ref_v[wet], rtol=0.1, atol=0.5)
        af = float(np.asarray(loci.ds["af"].data)[0])
        assert af == pytest.approx(2.0, rel=0.1)


class TestCalendarVariants:
    @pytest.mark.parametrize("calendar", ["360_day", "noleap", "all_leap"])
    def test_eqm_calendars(self, random, calendar):
        """EQM on non-standard calendars (reference tests/test_adjustment.py:454)."""
        from xsdba_tpu.utils.calendar import max_doy

        n = max_doy(calendar) * 3
        u = random.random(n)
        ref = series(stats.norm.ppf(u, 10, 1), calendar=calendar)
        hist = series(stats.norm.ppf(u, 12, 1), calendar=calendar)
        eqm = EmpiricalQuantileMapping.train(ref, hist, group="time.dayofyear", window=5, nquantiles=10)
        assert eqm.ds["af"].shape[0] == max_doy(calendar)
        scen = eqm.adjust(hist)
        assert abs(np.asarray(scen.data).mean() - 10) < 0.4

    def test_eqm_seasonal_group(self, random):
        u = random.random(365 * 4)
        ref = series(stats.norm.ppf(u, 10, 1))
        hist = series(stats.norm.ppf(u, 12, 1))
        eqm = EmpiricalQuantileMapping.train(ref, hist, group="time.season", nquantiles=20)
        assert eqm.ds["af"].dims == ("season", "quantiles")
        scen = eqm.adjust(hist, interp="linear")
        assert abs(np.asarray(scen.data).mean() - 10) < 0.2


@pytest.mark.slow
def test_eqm_windowed_ocean_masked_site_public_api():
    """An all-NaN (ocean-masked) site through the public windowed-doy EQM:
    NaN in -> NaN out for that site, and the land sites are IDENTICAL to a
    run on land-only data (the static fast path's per-site mask, see
    ops/quantile._finite_probe)."""
    from xsdba_tpu import DataArray, EmpiricalQuantileMapping, Grouper, date_range

    t = date_range("1990-01-01", periods=365 * 3, freq="D", calendar="noleap")
    rng = np.random.default_rng(3)
    S, T = 3, len(t)
    ref = rng.normal(12, 2, (S, T))
    hist = rng.normal(14, 3, (S, T))
    ref[1] = np.nan
    hist[1] = np.nan
    mk = lambda v: DataArray(v, ("site", "time"), {"time": t, "site": np.arange(v.shape[0])}, {"units": "K"}, "tas")  # noqa: E731
    g = Grouper("time.dayofyear", window=31)
    eqm = EmpiricalQuantileMapping.train(mk(ref), mk(hist), group=g, nquantiles=10)
    scen = eqm.adjust(mk(hist), interp="linear")
    sv = np.asarray(scen.data)
    assert np.isnan(sv[1]).all()
    assert np.isfinite(sv[[0, 2]]).all()
    eqm2 = EmpiricalQuantileMapping.train(mk(ref[[0, 2]]), mk(hist[[0, 2]]), group=g, nquantiles=10)
    scen2 = eqm2.adjust(mk(hist[[0, 2]]), interp="linear")
    np.testing.assert_allclose(sv[[0, 2]], np.asarray(scen2.data), rtol=1e-12)


def test_device_cache_skips_unweakrefable_owner():
    """np.frombuffer-backed arrays (bytes base) cannot register a weakref
    finalizer, so they must not be cached: a recycled (id, ptr) key would
    silently alias a later array's device data."""
    from xsdba_tpu.models._wrap import _DEV_CACHE, to_device_cached

    buf = bytes(8 * 16)
    a = np.frombuffer(buf, dtype=np.float64)
    before = set(_DEV_CACHE)
    out = to_device_cached(a)
    assert np.asarray(out).shape == (16,)
    assert set(_DEV_CACHE) == before  # nothing cached for this owner
    b = np.arange(16.0)
    out2 = to_device_cached(b)
    assert to_device_cached(b) is out2  # normal ndarrays still hit the cache


def test_device_cache_detects_inplace_mutation():
    """In-place mutation of a cached input must invalidate the cache entry
    (the content fingerprint in the key), not serve stale device data."""
    from xsdba_tpu.models._wrap import to_device_cached

    a = np.arange(32.0)
    d1 = to_device_cached(a)
    a *= 2.0
    d2 = to_device_cached(a)
    assert d2 is not d1
    np.testing.assert_array_equal(np.asarray(d2), a)
