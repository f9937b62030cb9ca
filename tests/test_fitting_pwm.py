"""L-moment (PWM) and approximate (APP/MM) fitting contracts.

The PWM estimators invert the first three L-moments (reference reaches the
same inversions through lmoments3, ``utils.py:1164-1193``; lmoments3 is not
installable here).  The oracle is therefore independent of the inversion
formulas: the *theoretical* L-moments of the fitted distribution — computed
by Gauss-Legendre integration of the scipy quantile function,
``lambda_r = int_0^1 q(u) P*_{r-1}(u) du`` — must reproduce the sample
L-moments the fit consumed.  Exact inversions (expon, gumbel_r, genpareto)
must match tightly; rational-approximation inversions (gamma, genextreme,
pearson3, weibull_min) to the approximations' published accuracy.
"""

import numpy as np
import pytest
from scipy import stats as sps

from xsdba_tpu.ops.fitting import PWM_SUPPORTED, fit_scipy, sample_lmoments

# nodes for the theoretical-L-moment quadrature
_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(4096)
_U = 0.5 * (_NODES + 1.0)  # map (-1, 1) -> (0, 1)
_W = 0.5 * _WEIGHTS


def theoretical_lmoments(dist, params):
    """(l1, l2, l3) of ``dist(*params)`` via shifted-Legendre quadrature."""
    q = dist.ppf(_U, *params)
    l1 = np.sum(_W * q)
    l2 = np.sum(_W * q * (2 * _U - 1.0))
    l3 = np.sum(_W * q * (6 * _U**2 - 6 * _U + 1.0))
    return l1, l2, l3


CASES = [
    # (scipy name, true params to sample from, rtol of the inversion)
    ("expon", (2.0, 3.0), 1e-5),
    ("gumbel_r", (10.0, 2.5), 1e-5),
    ("genpareto", (0.15, 1.0, 2.0), 1e-5),
    ("genpareto", (-0.2, 0.0, 1.5), 1e-5),
    ("gamma", (3.0, 0.0, 2.0), 5e-3),
    ("gamma", (0.7, 0.0, 1.0), 5e-3),
    ("genextreme", (0.12, 8.0, 2.0), 5e-3),
    ("genextreme", (-0.15, 0.0, 1.0), 5e-3),
    ("pearson3", (0.8, 5.0, 2.0), 5e-3),
    ("pearson3", (-0.5, 0.0, 1.0), 5e-3),
    ("weibull_min", (1.7, 0.0, 3.0), 5e-3),
    ("weibull_min", (0.9, 2.0, 1.0), 2e-2),
]


@pytest.mark.parametrize("name,true,rtol", CASES)
def test_pwm_inverts_sample_lmoments(name, true, rtol):
    dist = getattr(sps, name)
    rng = np.random.default_rng(hash(name) % 2**32)
    x = dist.rvs(*true, size=4000, random_state=rng)
    params = fit_scipy(x, name, method="PWM")
    assert not np.any(np.isnan(params)), params
    want = sample_lmoments(x)
    got = theoretical_lmoments(dist, params)
    # l1/l2 always match to the quoted tolerance; l3 only for 3-parameter fits
    n_check = 3 if len(params) == 3 and name != "gamma" else 2
    scale = max(abs(want[0]), abs(want[1]), 1e-12)
    for k in range(n_check):
        assert got[k] == pytest.approx(want[k], abs=rtol * scale), (k, got, want)


@pytest.mark.parametrize("name,true,_", CASES)
def test_pwm_recovers_parameters_large_sample(name, true, _):
    dist = getattr(sps, name)
    rng = np.random.default_rng(1234)
    x = dist.rvs(*true, size=200_000, random_state=rng)
    params = fit_scipy(x, name, method="PWM")
    for got, want in zip(params, true):
        assert got == pytest.approx(want, abs=0.12 + 0.05 * abs(want)), (name, params, true)


def test_pwm_unsupported_raises():
    x = np.random.default_rng(0).lognormal(size=100)
    with pytest.raises(NotImplementedError, match="lognorm"):
        fit_scipy(x, "lognorm", method="PWM")
    # the supported list is what lmoments3 ships
    assert "genpareto" in PWM_SUPPORTED and "lognorm" not in PWM_SUPPORTED


def test_pwm_degenerate_data_gives_nan():
    params = fit_scipy(np.zeros(50), "genpareto", method="PWM")
    assert np.all(np.isnan(params))
    params = fit_scipy(np.array([1.0]), "gamma", method="PWM")
    assert np.all(np.isnan(params))


class TestAppStarts:
    """APP returns the reference's closed-form estimates as the fit
    (reference utils.py:1172-1185, starts at 1197-1296)."""

    def test_fisk_app_near_truth(self):
        # the reference's moment-matched log-logistic start is a small-theta
        # (theta = pi/c) expansion — accurate for large shapes
        rng = np.random.default_rng(7)
        x = sps.fisk.rvs(8.0, loc=1.0, scale=2.0, size=200_000, random_state=rng)
        # known threshold (floc), as in the reference's fisk start with floc
        c, loc, scale = fit_scipy(x, "fisk", method="APP", floc=1.0)
        assert loc == 1.0
        assert c == pytest.approx(8.0, rel=0.06)
        assert scale == pytest.approx(2.0, rel=0.06)
        # free threshold: Cooke's estimator is noisy but must stay below min(x)
        c2, loc2, scale2 = fit_scipy(x, "fisk", method="APP")
        assert loc2 < x.min() and np.isfinite(c2) and scale2 > 0

    def test_weibull_app_near_truth(self):
        rng = np.random.default_rng(8)
        x = sps.weibull_min.rvs(2.0, loc=5.0, scale=3.0, size=100_000, random_state=rng)
        c, loc, scale = fit_scipy(x, "weibull_min", method="APP")
        assert c == pytest.approx(2.0, rel=0.15)
        assert loc == pytest.approx(5.0, abs=0.5)
        assert scale == pytest.approx(3.0, rel=0.15)

    def test_gamma_app_near_truth(self):
        rng = np.random.default_rng(9)
        x = sps.gamma.rvs(3.0, loc=0.0, scale=2.0, size=100_000, random_state=rng)
        a, loc, scale = fit_scipy(x, "gamma", method="APP")
        assert a == pytest.approx(3.0, rel=0.15)
        assert scale == pytest.approx(2.0, rel=0.2)

    def test_app_unsupported_raises(self):
        with pytest.raises(ValueError, match="APP"):
            fit_scipy(np.random.default_rng(0).normal(size=50), "lognorm", method="APP")


class TestGevMM:
    def test_fitted_distribution_reproduces_sample_moments(self):
        # the MM contract: dist(c, loc, scale) has the sample's mean, variance
        # and skewness.  (scipy genextreme.fit(method="MM") solves the same
        # system with fsolve, which stalls on ~half these rows; where it
        # converges — e.g. seeded row 1 — it agrees with this solution.)
        from xsdba_tpu.ops.fitting import gev_fit_mm

        rng = np.random.default_rng(3)
        rows = np.stack(
            [
                sps.genextreme.rvs(0.1, loc=10, scale=2, size=80, random_state=rng),
                sps.genextreme.rvs(-0.15, loc=0, scale=1, size=80, random_state=rng),
                sps.genextreme.rvs(0.3, loc=-5, scale=0.5, size=80, random_state=rng),
            ]
        )
        c, loc, scale = (np.asarray(p) for p in gev_fit_mm(rows))
        for i in range(rows.shape[0]):
            m, v, s = sps.genextreme(c[i], loc=loc[i], scale=scale[i]).stats(moments="mvs")
            assert float(m) == pytest.approx(rows[i].mean(), rel=1e-4)
            assert float(v) == pytest.approx(rows[i].var(), rel=1e-3)
            assert float(s) == pytest.approx(sps.skew(rows[i]), rel=1e-3, abs=1e-3)
        want = sps.genextreme.fit(rows[1], 0.1, loc=rows[1].mean(), scale=rows[1].std(), method="MM")
        assert c[1] == pytest.approx(want[0], abs=2e-3)
        assert loc[1] == pytest.approx(want[1], abs=2e-2)
        assert scale[1] == pytest.approx(want[2], abs=2e-2)

    def test_nan_rows(self):
        from xsdba_tpu.ops.fitting import gev_fit_mm

        rows = np.full((2, 10), np.nan)
        rows[1, :2] = [1.0, 2.0]
        c, loc, scale = (np.asarray(p) for p in gev_fit_mm(rows))
        assert np.all(np.isnan(c)) and np.all(np.isnan(loc)) and np.all(np.isnan(scale))
