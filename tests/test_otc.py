import numpy as np
import pytest

from xsdba_tpu import DataArray, Dataset, date_range
from xsdba_tpu.models import OTC, dOTC
from xsdba_tpu.native import emd, have_native
from xsdba_tpu.ops.ot import bin_width_estimator, histogram, optimal_transport, sinkhorn_plan
from xsdba_tpu.processing import stack_variables


def bivariate(rng, n, mean, cov, start="2000-01-01"):
    t = date_range(start, periods=n, freq="D", calendar="noleap")
    vals = rng.multivariate_normal(mean, cov, size=n).T
    return stack_variables(
        Dataset(
            {
                "tas": DataArray(vals[0], ("time",), {"time": t}, {"units": "K"}, "tas"),
                "pr": DataArray(vals[1], ("time",), {"time": t}, {"units": "mm/d"}, "pr"),
            }
        )
    )


def test_native_builds():
    assert have_native()


def test_emd_matches_lp(random):
    from scipy.optimize import linprog

    n, m = 25, 30
    mu = random.random(n)
    mu /= mu.sum()
    nu = random.random(m)
    nu /= nu.sum()
    C = random.random((n, m))
    plan = emd(mu, nu, C)
    np.testing.assert_allclose(plan.sum(1), mu, atol=1e-10)
    np.testing.assert_allclose(plan.sum(0), nu, atol=1e-10)
    A_eq = []
    for i in range(n):
        row = np.zeros((n, m))
        row[i, :] = 1
        A_eq.append(row.ravel())
    for j in range(m):
        row = np.zeros((n, m))
        row[:, j] = 1
        A_eq.append(row.ravel())
    res = linprog(C.ravel(), A_eq=np.array(A_eq), b_eq=np.concatenate([mu, nu]), bounds=(0, None), method="highs")
    assert (plan * C).sum() == pytest.approx(res.fun, abs=1e-9)


def test_simplex_matches_ssp(random):
    """Network simplex vs the independent successive-shortest-paths solver
    (via the public ``emd_ssp`` wrapper)."""
    from xsdba_tpu.native import emd_ssp

    for _ in range(8):
        n, m = int(random.integers(2, 80)), int(random.integers(2, 80))
        mu = random.random(n) + 1e-3
        mu /= mu.sum()
        nu = random.random(m) + 1e-3
        nu /= nu.sum()
        x = random.normal(0, 1, (n, 2))
        y = random.normal(0.4, 1.1, (m, 2))
        C = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        plan = emd(mu, nu, C)
        ref = emd_ssp(mu, nu, C)
        np.testing.assert_allclose(plan.sum(1), mu, atol=1e-10)
        np.testing.assert_allclose(plan.sum(0), nu, atol=1e-10)
        np.testing.assert_allclose(ref.sum(1), mu, atol=1e-10)
        assert (plan * C).sum() == pytest.approx((ref * C).sum(), abs=1e-8)


def test_sinkhorn_close_to_emd(random):
    n, m = 20, 22
    mu = np.ones(n) / n
    nu = np.ones(m) / m
    x = np.sort(random.normal(0, 1, n))
    y = np.sort(random.normal(0, 1, m))
    C = (x[:, None] - y[None, :]) ** 2
    p_exact = emd(mu, nu, C)
    p_sink = np.asarray(sinkhorn_plan(mu, nu, C, reg=1e-3, n_iter=2000))
    assert (p_sink * C).sum() == pytest.approx((p_exact * C).sum(), rel=0.05)


def test_histogram():
    data = np.array([[0.1, 0.1], [1.9, 0.1], [1.95, 0.1], [2.5, 3.5]])
    centers, mu, idx = histogram(data, np.array([1.0, 1.0]), np.array([0.0, 0.0]))
    assert len(mu) == 3
    np.testing.assert_allclose(sorted(mu), [0.25, 0.25, 0.5])
    assert idx.shape == (4, 2)
    # centers are bin midpoints
    assert [0.5, 0.5] in centers.tolist() and [1.5, 0.5] in centers.tolist()


def test_bin_width_estimator(random):
    x = random.normal(0, 1, (1000, 2))
    bw = bin_width_estimator(x)
    assert bw.shape == (2,) and np.all(bw > 0)
    bw2 = bin_width_estimator([x, x * 2])
    np.testing.assert_allclose(bw2, bw)


class TestOTC:
    def test_distribution_recovery(self, random):
        n = 1500
        ref = bivariate(random, n, [0, 0], [[1.0, 0.6], [0.6, 1.0]])
        hist = bivariate(random, n, [3, 2], [[1.5, -0.3], [-0.3, 0.8]])
        scen = OTC.adjust(ref, hist)
        sv = np.asarray(scen.data)
        rv = np.asarray(ref.data)
        np.testing.assert_allclose(sv.mean(1), rv.mean(1), atol=0.15)
        np.testing.assert_allclose(np.cov(sv), np.cov(rv), atol=0.25)

    def test_rejects_sim(self, random):
        ref = bivariate(random, 300, [0, 0], np.eye(2))
        hist = bivariate(random, 300, [1, 1], np.eye(2))
        sim = bivariate(random, 300, [2, 2], np.eye(2))
        with pytest.raises(ValueError, match="does not take a `sim`"):
            OTC.adjust(ref, hist, sim)

    def test_jitter_center_options(self, random):
        ref = bivariate(random, 500, [0, 0], np.eye(2))
        hist = bivariate(random, 500, [2, 2], np.eye(2))
        scen_c = OTC.adjust(ref, hist, jitter_inside_bins=False, bin_width=0.5)
        sv = np.asarray(scen_c.data)
        # bin centers: values should be on the 0.25 + 0.5k lattice
        frac = np.abs(((sv - 0.25) / 0.5) - np.round((sv - 0.25) / 0.5))
        assert np.nanmax(frac) < 1e-9

    def test_sinkhorn_solver(self, random):
        ref = bivariate(random, 400, [0, 0], np.eye(2))
        hist = bivariate(random, 400, [2, 1], np.eye(2))
        scen = OTC.adjust(ref, hist, solver="sinkhorn")
        sv = np.asarray(scen.data)
        np.testing.assert_allclose(sv.mean(1), np.asarray(ref.data).mean(1), atol=0.3)


class TestDOTC:
    def test_preserves_change(self, random):
        n = 1200
        ref = bivariate(random, n, [0, 0], [[1.0, 0.5], [0.5, 1.0]])
        hist = bivariate(random, n, [1, 1], [[1.0, 0.2], [0.2, 1.0]])
        sim = bivariate(random, n, [3, 2.5], [[1.0, 0.2], [0.2, 1.0]], start="2050-01-01")
        scen = dOTC.adjust(ref, hist, sim)
        sv = np.asarray(scen.data)
        # the hist->sim shift is transported onto ref (stacked order is
        # alphabetical: row 0 = pr (+1.5), row 1 = tas (+2.0))
        delta = sv.mean(1) - np.asarray(ref.data).mean(1)
        np.testing.assert_allclose(delta, [1.5, 2.0], atol=0.35)

    def test_multiplicative_kind(self, random):
        n = 800
        ref = bivariate(random, n, [5, 10], [[0.5, 0.1], [0.1, 0.5]])
        hist = bivariate(random, n, [6, 12], [[0.5, 0.1], [0.1, 0.5]])
        sim = bivariate(random, n, [9, 18], [[0.5, 0.1], [0.1, 0.5]], start="2050-01-01")
        scen = dOTC.adjust(ref, hist, sim, kind={"pr": "*"}, cov_factor="std")
        assert np.isfinite(np.asarray(scen.data)).all()

    def test_cholesky_cov_factor(self, random):
        n = 600
        ref = bivariate(random, n, [0, 0], [[1.0, 0.4], [0.4, 1.0]])
        hist = bivariate(random, n, [1, 1], np.eye(2))
        sim = bivariate(random, n, [2, 2], np.eye(2), start="2050-01-01")
        scen = dOTC.adjust(ref, hist, sim, cov_factor="cholesky")
        assert np.isfinite(np.asarray(scen.data)).all()


def test_dict_bin_width_estimated_per_group(random):
    """Dict-form bin_width: unnamed variables' widths are estimated from the
    participating clouds of each transport (reference _adjustment.py:1285-1289),
    not pooled across groups."""
    from xsdba_tpu.models.otc import _BinSpec

    a = random.normal(0, 1, (200, 2))
    b = random.normal(0, 100, (200, 2))
    spec = _BinSpec(np.array([0.5, np.nan]), np.zeros(2))
    wa = spec.fill([a]).width
    wb = spec.fill([b]).width
    assert wa[0] == wb[0] == 0.5  # named entry is pinned
    assert wb[1] > 10 * wa[1]  # unnamed entry follows the group's own scale
