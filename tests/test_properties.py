import numpy as np
import pytest
from scipy import stats as sps

import xsdba_tpu as xt
from xsdba_tpu import measures, properties


def series(values, units="K", start="2000-01-01", calendar="noleap"):
    t = xt.date_range(start, periods=np.shape(values)[-1], freq="D", calendar=calendar)
    dims = ("time",) if np.ndim(values) == 1 else ("site", "time")
    return xt.DataArray(np.asarray(values, dtype=np.float64), dims, {"time": t}, {"units": units}, "tas")


class TestMarginal:
    def test_mean_var_std_skew_quantile(self, random):
        x = random.gamma(3, 2, 365 * 4)
        da = series(x)
        assert float(np.asarray(properties.mean(da).data)) == pytest.approx(x.mean(), rel=1e-9)
        assert float(np.asarray(properties.var(da).data)) == pytest.approx(x.var(), rel=1e-9)
        assert float(np.asarray(properties.std(da).data)) == pytest.approx(x.std(), rel=1e-9)
        assert float(np.asarray(properties.skewness(da).data)) == pytest.approx(sps.skew(x), rel=1e-6)
        assert float(np.asarray(properties.quantile(da, q=0.9).data)) == pytest.approx(np.quantile(x, 0.9), rel=1e-6)

    def test_monthly_grouping(self, random):
        x = random.normal(10, 2, 365 * 3)
        da = series(x)
        m = properties.mean(da, group="time.month")
        assert m.dims[-1] == "month" and m.shape[-1] == 12
        jan = np.asarray(m.data)[0]
        assert jan == pytest.approx(x[np.asarray(da.time.month) == 1].mean(), rel=1e-9)

    def test_var_units(self, random):
        da = series(random.normal(0, 1, 100))
        assert properties.var(da).attrs["units"] == "(K)2"


class TestTemporal:
    def test_spell_length(self, random):
        # deterministic: 3-day spells every 10 days
        x = np.zeros(360)
        for s in range(0, 360, 10):
            x[s : s + 3] = 5.0
        da = series(x, units="mm/d")
        out = properties.spell_length_distribution(da, thresh="1 mm/d", op=">=", stat="mean")
        assert float(np.asarray(out.data)) == pytest.approx(3.0, abs=0.1)

    def test_acf(self, random):
        n = 365 * 6
        # AR(1) with rho=0.7
        rho = 0.7
        eps = random.normal(0, 1, n)
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = rho * x[i - 1] + eps[i]
        da = series(x)
        out = properties.acf(da, lag=1, group="time.season")
        vals = np.asarray(out.data)
        assert vals.shape == (4,)
        np.testing.assert_allclose(vals, rho, atol=0.12)

    def test_acf_group_validation(self, random):
        da = series(random.normal(0, 1, 365))
        with pytest.raises(ValueError, match="not allowed"):
            properties.acf(da, group="time")

    def test_annual_cycle(self, random):
        n = 365 * 5
        doy = np.arange(n) % 365
        x = 10 + 5 * np.sin(2 * np.pi * (doy - 90) / 365) + random.normal(0, 0.3, n)
        da = series(x)
        amp = float(np.asarray(properties.annual_cycle_amplitude(da).data))
        assert amp == pytest.approx(10, abs=0.7)
        phase = float(np.asarray(properties.annual_cycle_phase(da).data))
        assert phase == pytest.approx(90 + 365 / 4 + 1, abs=10)
        mx = float(np.asarray(properties.annual_cycle_maximum(da).data))
        assert mx == pytest.approx(15, abs=0.5)

    def test_relative_frequency_and_transition(self, random):
        x = (random.random(3650) < 0.3) * 5.0
        da = series(x, units="mm/d")
        f = float(np.asarray(properties.relative_frequency(da, op=">=", thresh="1 mm/d").data))
        assert f == pytest.approx(0.3, abs=0.03)
        p = float(np.asarray(properties.transition_probability(da, thresh="1 mm/d").data))
        assert p == pytest.approx(0.09, abs=0.02)  # independent days: 0.3^2

    def test_trend(self, random):
        n = 365 * 10
        x = 10 + 0.01 * np.arange(n) / 365 + random.normal(0, 0.5, n)
        da = series(x)
        slope = float(np.asarray(properties.trend(da).data))
        assert slope == pytest.approx(0.01, abs=0.05)
        r = float(np.asarray(properties.trend(da, output="pvalue").data))
        assert 0 <= r <= 1

    def test_return_value(self, random):
        n = 365 * 30
        x = sps.genextreme.rvs(0.1, loc=30, scale=3, size=n, random_state=42)
        da = series(x)
        rv = float(np.asarray(properties.return_value(da, period=20, op="max").data))
        assert rv > np.quantile(x, 0.99)

    def test_return_value_all_methods_batched(self, random):
        # ML/PWM/MM/APP all run on device; estimates agree on clean GEV data
        n = 365 * 30
        x = sps.genextreme.rvs(0.1, loc=30, scale=3, size=n, random_state=7)
        da = series(x)
        vals = {
            m: float(np.asarray(properties.return_value(da, period=20, op="max", method=m).data))
            for m in ("ML", "PWM", "MM", "APP")
        }
        ml = vals["ML"]
        for m, v in vals.items():
            assert v == pytest.approx(ml, rel=0.05), vals
        with pytest.raises(ValueError, match="method"):
            properties.return_value(da, method="NOPE")


class TestMultivariateSpatial:
    def test_corr_btw_var(self, random):
        n = 2000
        x = random.normal(0, 1, n)
        y = 0.8 * x + 0.2 * random.normal(0, 1, n)
        da1, da2 = series(x), series(y, units="mm/d")
        r = float(np.asarray(properties.corr_btw_var(da1, da2, corr_type="Pearson").data))
        want = np.corrcoef(x, y)[0, 1]
        assert r == pytest.approx(want, abs=0.01)
        rs = float(np.asarray(properties.corr_btw_var(da1, da2, corr_type="Spearman").data))
        want_s = sps.spearmanr(x, y)[0]
        assert rs == pytest.approx(want_s, abs=0.01)

    def test_pairwise_haversine(self):
        lon = np.array([0.0, 0.0])
        lat = np.array([0.0, 1.0])
        d = np.asarray(properties.pairwise_haversine(lon, lat))
        assert d[0, 1] == pytest.approx(111.15, rel=0.01)

    def test_spatial_correlogram(self, random):
        nsite, nt = 12, 500
        lon = random.uniform(0, 5, nsite)
        lat = random.uniform(40, 45, nsite)
        base = random.normal(0, 1, nt)
        x = base[None, :] + random.normal(0, 0.5, (nsite, nt))
        t = xt.date_range("2000-01-01", periods=nt, freq="D", calendar="noleap")
        da = xt.DataArray(x, ("site", "time"), {"time": t, "lon": lon, "lat": lat}, {"units": "K"}, "tas")
        out = properties.spatial_correlogram(da, bins=5)
        v = np.asarray(out.data)
        assert np.nanmax(v) > 0.5  # strongly correlated sites

    def test_first_eof_recovers_planted_pattern(self, random):
        nsite, nt = 40, 300
        pattern = random.normal(0, 1, nsite)
        pattern /= np.linalg.norm(pattern)
        if pattern[np.argmax(np.abs(pattern))] < 0:
            pattern = -pattern
        pc = random.normal(0, 3, nt)
        x = 10 + np.outer(pattern, pc) + random.normal(0, 0.05, (nsite, nt))
        out = properties.first_eof(series(x))
        assert out.dims == ("site",)
        assert np.abs(np.asarray(out.data) - pattern).max() < 0.02
        assert out.attrs["variance_fraction"] > 0.95
        assert out.attrs["units"] == ""

    @pytest.mark.parametrize("nsite,nt", [(30, 120), (120, 30)])
    def test_first_eof_svd_oracle_both_gram_sides(self, random, nsite, nt):
        # nt > nsite exercises the site-side eigh, nt < nsite the time-side
        # Gram trick; both must match a plain SVD of the anomaly matrix
        x = random.normal(5, 2, (nsite, nt))
        out = properties.first_eof(series(x))
        a = (x - x.mean(axis=1, keepdims=True)).T  # [T, S]
        _, s, vt = np.linalg.svd(a, full_matrices=False)
        want = vt[0] / np.linalg.norm(vt[0])
        want = want * np.sign(want[np.argmax(np.abs(want))])
        np.testing.assert_allclose(np.asarray(out.data), want, atol=1e-6)
        frac = s[0] ** 2 / (s**2).sum()
        assert out.attrs["variance_fraction"] == pytest.approx(frac, rel=1e-6)

    def test_first_eof_nan_site_and_mult_kind(self, random):
        x = random.normal(10, 2, (20, 100))
        x[3] = np.nan
        v = np.asarray(properties.first_eof(series(x)).data)
        assert np.isnan(v[3]) and np.isfinite(np.delete(v, 3)).all()
        # finite sites match a run with the NaN site dropped entirely
        sub = np.asarray(properties.first_eof(series(np.delete(x, 3, axis=0))).data)
        np.testing.assert_allclose(np.delete(v, 3), sub, atol=1e-7)
        vm = np.asarray(properties.first_eof(series(x), kind="*").data)
        assert np.isnan(vm[3])
        assert np.linalg.norm(vm[np.isfinite(vm)]) == pytest.approx(1.0, rel=1e-9)


class TestMeasures:
    def test_bias_family(self, random):
        s = series(np.array([12.0]), units="K")
        s.coords.pop("time")
        s = xt.DataArray(np.array(12.0), (), {}, {"units": "K"}, "x")
        r = xt.DataArray(np.array(10.0), (), {}, {"units": "K"}, "x")
        assert float(np.asarray(measures.bias(s, r).data)) == 2.0
        assert float(np.asarray(measures.relative_bias(s, r).data)) == pytest.approx(0.2)
        assert float(np.asarray(measures.ratio(s, r).data)) == pytest.approx(1.2)

    def test_circular_bias(self):
        def cb(sv, rv):
            s = xt.DataArray(np.array(sv), (), {}, {"units": ""}, "x")
            r = xt.DataArray(np.array(rv), (), {}, {"units": ""}, "x")
            return float(np.asarray(measures.circular_bias(s, r).data))

        assert cb(360.0, 5.0) == pytest.approx(-10.0)
        # the reference's sign is the LINEAR ref >= sim comparison: doy 365
        # vs 1 gives -1 (its own docstring example), but 10 vs 9 also -1
        assert cb(365.0, 1.0) == pytest.approx(-1.0)
        assert cb(10.0, 9.0) == pytest.approx(-1.0)
        assert cb(1.0, 365.0) == pytest.approx(1.0)
        assert cb(100.0, 300.0) == pytest.approx(165.0)

    def test_rmse_mae(self, random):
        x = random.normal(10, 1, 500)
        y = x + 1
        assert float(np.asarray(measures.rmse(series(y), series(x)).data)) == pytest.approx(1.0, abs=1e-9)
        assert float(np.asarray(measures.mae(series(y), series(x)).data)) == pytest.approx(1.0, abs=1e-9)

    def test_annual_cycle_correlation(self, random):
        n = 365 * 4
        doy = np.arange(n) % 365
        x = 10 + 5 * np.sin(2 * np.pi * doy / 365) + random.normal(0, 0.2, n)
        y = 12 + 4 * np.sin(2 * np.pi * doy / 365) + random.normal(0, 0.2, n)
        r = float(np.asarray(measures.annual_cycle_correlation(series(x), series(y)).data))
        assert r > 0.99

    def test_taylordiagram(self, random):
        x = random.normal(0, 2, 1000)
        y = x + random.normal(0, 0.5, 1000)
        out = measures.taylordiagram(series(y), series(x))
        v = np.asarray(out.data)
        assert v.shape == (3,)
        assert v[0] == pytest.approx(2, abs=0.2)  # ref std
        assert v[2] > 0.9  # corr

    def test_units_mismatch_handled(self, random):
        s = xt.DataArray(np.array(285.0), (), {}, {"units": "K"}, "x")
        r = xt.DataArray(np.array(10.0), (), {}, {"units": "degC"}, "x")
        assert float(np.asarray(measures.bias(s, r).data)) == pytest.approx(285.0 - 283.15)


def test_trend_units_parse():
    """degC/year must round-trip the units engine (caught by pipeline drive)."""
    from xsdba_tpu.utils.units import parse_units

    u = parse_units("degC/year")
    assert u.dims[3] == 1 and u.dims[2] == -1


class TestReferenceParityChecklist:
    """Every reference indicator name must exist with the right contract
    (reference properties.py instances + measures.py:26-135 classes)."""

    REF_PROPERTIES = [
        "mean", "var", "std", "skewness", "quantile",
        "spell_length_distribution", "threshold_count", "acf",
        "annual_cycle_amplitude", "relative_annual_cycle_amplitude",
        "annual_cycle_phase", "annual_cycle_asymmetry", "annual_cycle_minimum",
        "annual_cycle_maximum", "mean_annual_range", "mean_annual_relative_range",
        "mean_annual_phase", "corr_btw_var", "bivariate_spell_length_distribution",
        "bivariate_threshold_count", "relative_frequency", "transition_probability",
        "trend", "return_value", "spatial_correlogram", "decorrelation_length",
        "spectral_variance", "first_eof",
    ]
    REF_MEASURES = [
        "bias", "relative_bias", "circular_bias", "ratio", "rmse", "mae",
        "annual_cycle_correlation", "scorr", "taylordiagram",
    ]

    def test_all_properties_exist(self):
        for name in self.REF_PROPERTIES:
            prop = getattr(properties, name)
            assert isinstance(prop, properties.StatisticalProperty), name
            assert prop.aspect in ("marginal", "temporal", "multivariate", "spatial"), name

    def test_all_measures_exist_with_class_contract(self):
        for name in self.REF_MEASURES:
            m = getattr(measures, name)
            assert isinstance(m, measures.StatisticalMeasure), name
        for name in ["rmse", "mae", "annual_cycle_correlation", "scorr", "taylordiagram"]:
            m = getattr(measures, name)
            assert isinstance(m, measures.StatisticalPropertyMeasure), name
            assert m.aspect in ("temporal", "spatial"), name

    def test_measure_unit_conversion_and_checks(self, timeseries):
        import pytest as _pytest

        sim = timeseries(np.full(10, 285.0), units="K")
        ref = timeseries(np.full(10, 10.0), units="degC")
        out = measures.bias(sim, ref)
        np.testing.assert_allclose(np.asarray(out.data), 285.0 - 283.15, rtol=1e-9)
        # mismatched time coordinates must raise
        ref2 = timeseries(np.full(11, 10.0), units="degC")
        with _pytest.raises(ValueError, match="Common dimension"):
            measures.bias(sim, ref2)
        # disallowed grouping on a property-measure must raise
        with _pytest.raises(ValueError, match="not allowed"):
            measures.rmse(sim, ref, group="time.month")

    def test_bivariate_threshold_count_values(self, timeseries):
        # 6 years daily; condition met where both series exceed 0.5
        t = 365 * 6
        a = np.zeros(t); b = np.zeros(t)
        a[:100] = 1.0
        b[50:300] = 1.0  # overlap = days 50..99 -> 50 days, all in year 1
        sim1 = timeseries(a, units="mm/d", calendar="noleap")
        sim2 = timeseries(b, units="mm/d", calendar="noleap")
        out = properties.bivariate_threshold_count(
            sim1, sim2, op1=">=", op2=">=", thresh1="0.5 mm/d", thresh2="0.5 mm/d",
            stat="sum", stat_resample="sum", group="time",
        )
        assert float(np.asarray(out.data)) == 50.0
        assert out.attrs["aspect"] == "multivariate"


class TestBatchedFitKernels:
    """Device-side linregress / GEV kernels vs scipy (the host loops they replaced)."""

    def test_linregress_fields_match_scipy(self, random):
        from scipy import stats as sps

        from xsdba_tpu.ops.fitting import linregress_field

        P = 24
        Y = random.normal(0, 1, (20, P)) + 0.2 * np.arange(P)
        Y[random.random(Y.shape) < 0.2] = np.nan
        x = np.arange(P, dtype=float)
        for f in ["slope", "intercept", "rvalue", "pvalue", "stderr", "intercept_stderr"]:
            ours = np.asarray(linregress_field(Y, x, f))
            for i, row in enumerate(Y):
                m = ~np.isnan(row)
                if m.sum() < 3:
                    assert np.isnan(ours[i])
                    continue
                res = sps.linregress(x[m], row[m])
                want = res.intercept_stderr if f == "intercept_stderr" else getattr(res, f)
                assert ours[i] == pytest.approx(want, abs=1e-10), f

    def test_gev_fits_nan_below_minimum_samples(self):
        """A 3-parameter fit with < 3 valid samples must return NaN, not
        fabricated parameters (heavily-masked ocean-adjacent sites)."""
        from xsdba_tpu.ops.fitting import gev_fit_ml, gev_fit_pwm

        X = np.full((3, 50), np.nan)
        X[1, :2] = [1.0, 2.0]
        X[2, :10] = np.linspace(1, 5, 10)
        for fit in (gev_fit_pwm, gev_fit_ml):
            c, loc, scale = (np.asarray(v) for v in fit(X))
            assert np.isnan([c[0], loc[0], scale[0]]).all(), fit.__name__
            assert np.isnan([c[1], loc[1], scale[1]]).all(), fit.__name__
            assert np.isfinite([c[2], loc[2], scale[2]]).all(), fit.__name__

    def test_gev_ml_at_least_as_good_as_scipy(self, random):
        from scipy import stats as sps

        from xsdba_tpu.ops.fitting import gev_fit_ml

        X = sps.genextreme.rvs(0.12, loc=30, scale=3, size=(8, 60), random_state=1)
        X[random.random(X.shape) < 0.1] = np.nan
        c, loc, scale = gev_fit_ml(X)
        for i, row in enumerate(X):
            r = row[~np.isnan(row)]
            sp = sps.genextreme.fit(r)
            ours = -sps.genextreme.logpdf(r, float(c[i]), float(loc[i]), float(scale[i])).sum()
            theirs = -sps.genextreme.logpdf(r, *sp).sum()
            assert ours <= theirs + 1e-3

    def test_gev_pwm_recovers_params(self):
        from scipy import stats as sps

        from xsdba_tpu.ops.fitting import gev_fit_pwm

        X = sps.genextreme.rvs(0.1, loc=30, scale=3, size=(1, 20000), random_state=2)
        c, loc, scale = gev_fit_pwm(X)
        assert float(c[0]) == pytest.approx(0.1, abs=0.05)
        assert float(loc[0]) == pytest.approx(30, abs=0.15)
        assert float(scale[0]) == pytest.approx(3, abs=0.1)

    def test_gev_all_nan(self):
        from xsdba_tpu.ops.fitting import gev_fit_ml

        c, loc, scale = gev_fit_ml(np.full((2, 10), np.nan))
        assert np.isnan(np.asarray(c)).all()


def test_decorrelation_length_matches_per_row_oracle():
    """The one-pass (row, bin) binning must match a literal per-row loop
    (the reference's dataflow, properties.py:1412-1537)."""
    import jax.numpy as jnp

    from xsdba_tpu import DataArray, date_range
    from xsdba_tpu.properties import (
        _decorrelation_length,
        _pairwise_spearman,
        pairwise_haversine,
    )

    rng = np.random.default_rng(5)
    n, T, radius, thresh, bins = 12, 400, 300, 0.5, 20
    lon = rng.uniform(0, 3, n)
    lat = rng.uniform(40, 43, n)
    base = rng.normal(size=T)
    x = base[None, :] * rng.uniform(0.2, 1.0, (n, 1)) + rng.normal(0, 1.0, (n, T))
    t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
    da = DataArray(x, ("site", "time"), {"time": t, "lon": lon, "lat": lat}, {"units": "K"}, "tas")

    got = np.asarray(_decorrelation_length(da, radius=radius, thresh=thresh, bins=bins).data)

    dists = np.asarray(pairwise_haversine(lon, lat))
    corr = np.asarray(_pairwise_spearman(jnp.asarray(x)))
    edges = np.linspace(0, radius, bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    want = np.full(n, np.nan)
    for i in range(n):
        m = (dists[i] > 0) & (dists[i] <= radius)
        if not m.any():
            continue
        which = np.clip(np.digitize(dists[i][m], edges) - 1, 0, bins - 1)
        sums = np.bincount(which, weights=np.nan_to_num(corr[i][m]), minlength=bins)
        cnts = np.bincount(which, weights=(~np.isnan(corr[i][m])).astype(float), minlength=bins)
        prof = np.where(cnts > 0, sums / np.where(cnts == 0, 1, cnts), np.nan)
        below = np.nonzero(prof < thresh)[0]
        want[i] = centers[below[0]] if len(below) else radius

    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


class TestReviewPass5:
    def test_acf_default_group_is_season(self, random):
        # the wrapper must honor the compute function's own default group
        da = series(random.normal(10, 2, 365 * 3))
        out = properties.acf(da)  # no group kwarg: "time.season" default
        assert out.dims[-1] == "season" and out.shape[-1] == 4

    def test_corr_btw_var_pvalue(self, random):
        n = 500
        x = random.normal(0, 1, n)
        y = 0.6 * x + 0.8 * random.normal(0, 1, n)
        da1, da2 = series(x), series(y, units="mm/d")
        for ct, fn in (("Pearson", sps.pearsonr), ("Spearman", sps.spearmanr)):
            p = float(np.asarray(properties.corr_btw_var(da1, da2, corr_type=ct, output="pvalue").data))
            want = fn(x, y)[1]
            assert p == pytest.approx(want, abs=1e-6), ct
        with pytest.raises(ValueError, match="output"):
            properties.corr_btw_var(da1, da2, output="zvalue")

    def test_phase_properties_nan_site(self, random):
        x = random.normal(10, 2, (2, 365 * 3))
        x[1] = np.nan
        t = xt.date_range("2000-01-01", periods=x.shape[-1], freq="D", calendar="noleap")
        da = xt.DataArray(x, ("site", "time"), {"time": t}, {"units": "K"}, "tas")
        for prop in (properties.annual_cycle_phase, properties.annual_cycle_asymmetry, properties.mean_annual_phase):
            v = np.asarray(prop(da).data)
            assert np.isfinite(v[0]), prop.identifier
            assert np.isnan(v[1]), prop.identifier

    def test_average_rank_inf_not_tied_with_nan(self):
        from xsdba_tpu.ops.rank import average_rank

        x = np.array([3.0, np.nan, 1.0, np.inf])
        r = np.asarray(average_rank(x))
        np.testing.assert_array_equal(r[[0, 2, 3]], [2.0, 1.0, 3.0])
        assert np.isnan(r[1])
        # ties among genuine values still average
        r2 = np.asarray(average_rank(np.array([2.0, 2.0, np.nan, 1.0])))
        np.testing.assert_array_equal(r2[[0, 1, 3]], [2.5, 2.5, 1.0])
