import numpy as np
import pytest
from scipy import stats

from xsdba_tpu import DataArray, date_range
from xsdba_tpu.models import ExtremeValues, PrincipalComponents
from xsdba_tpu.ops.clusters import cluster_fields, cluster_maxima
from xsdba_tpu.ops.fitting import gpd_fit_ml
from xsdba_tpu.ops.pca import pc_matrix


def series(values, units="mm/d", start="2000-01-01"):
    t = date_range(start, periods=np.shape(values)[-1], freq="D", calendar="noleap")
    dims = ("time",) if np.ndim(values) == 1 else tuple(f"d{i}" for i in range(np.ndim(values) - 1)) + ("time",)
    return DataArray(np.asarray(values, dtype=np.float64), dims, {"time": t}, {"units": units}, "pr")


class TestClusters:
    def test_against_reference_algorithm(self):
        x = np.array([0, 1, 3, 2, 0, 0, 5, 0, 1, 1, 4, 1, 0, 2.5, 0])
        # reference semantics: runs of x > u2=0.5 containing a value > u1=2
        out = {k: np.asarray(v) for k, v in cluster_fields(x, 2.0, 0.5, max_clusters=7).items()}
        assert out["nclusters"] == 4
        np.testing.assert_array_equal(out["start"][:4], [1, 6, 8, 13])
        np.testing.assert_array_equal(out["end"][:4], [3, 6, 11, 13])
        np.testing.assert_array_equal(out["maxpos"][:4], [2, 6, 10, 13])
        np.testing.assert_allclose(out["maximum"][:4], [3, 5, 4, 2.5])
        assert np.all(out["start"][4:] == -1)
        assert np.all(np.isnan(out["maximum"][4:]))

    def test_cluster_maxima_batched(self, random):
        x = random.gamma(2, 2, size=(3, 200))
        mx = np.asarray(cluster_maxima(x, 8.0, 2.0, max_clusters=100))
        assert mx.shape == (3, 100)
        valid = mx[~np.isnan(mx)]
        assert np.all(valid > 8.0)


class TestGPDFit:
    @pytest.mark.parametrize("c_true", [-0.2, 0.001, 0.3])
    def test_matches_scipy_ml(self, random, c_true):
        x = stats.genpareto.rvs(c_true, loc=0, scale=2.0, size=3000, random_state=42)
        c_hat, s_hat = (float(np.asarray(v)) for v in gpd_fit_ml(x))
        c_sp, _, s_sp = stats.genpareto.fit(x, floc=0)
        assert c_hat == pytest.approx(c_sp, abs=0.03)
        assert s_hat == pytest.approx(s_sp, rel=0.05)

    def test_batched_with_nans(self, random):
        x = np.full((2, 500), np.nan)
        x[0, :400] = stats.genpareto.rvs(0.2, scale=1.5, size=400, random_state=1)
        x[1, :100] = stats.genpareto.rvs(-0.1, scale=3.0, size=100, random_state=2)
        c, s = (np.asarray(v) for v in gpd_fit_ml(x))
        assert c[0] == pytest.approx(0.2, abs=0.15)
        assert s[1] == pytest.approx(3.0, rel=0.4)


class TestExtremeValues:
    @pytest.mark.parametrize(
        "q_thresh,frac,power",
        [(0.95, 0.25, 1), pytest.param(0.90, 1e-6, 1, marks=pytest.mark.slow)],
    )
    def test_simple(self, random, q_thresh, frac, power):
        """Reference test design (tests/test_adjustment.py:1302-1342):
        clipped normal bulk + genpareto tail; extremes must stay extreme."""
        n = 8 * 365

        def gen(c, s):
            base = np.clip(random.normal(0, s, n), 0, None)
            qv = np.quantile(base[base > 1], q_thresh)
            tail = base > qv
            base[tail] = stats.genpareto.rvs(c, loc=qv, scale=s, size=tail.sum(), random_state=random.integers(1 << 30))
            return base, qv

        ref_v, qv_r = gen(-0.1, 2)
        hist_v, qv_h = gen(-0.1, 2)
        sim_v, _ = gen(-0.15, 2.5)
        # jitter under thresh to avoid ties at 0
        ref_v = np.where(ref_v < 1e-3, random.uniform(1e-6, 1e-3, n), ref_v)
        hist_v = np.where(hist_v < 1e-3, random.uniform(1e-6, 1e-3, n), hist_v)
        ref, hist, sim = series(ref_v), series(hist_v), series(sim_v)

        ev = ExtremeValues.train(ref, hist, cluster_thresh="1 mm/d", q_thresh=q_thresh)
        thresh = float(np.asarray(ev.ds["thresh"].data)[0])
        assert thresh == pytest.approx((qv_r + qv_h) / 2, rel=0.05)

        # first-order scen from EQM
        from xsdba_tpu.models import EmpiricalQuantileMapping

        eqm = EmpiricalQuantileMapping.train(ref, hist, nquantiles=15, kind="*")
        scen0 = eqm.adjust(sim)
        scen2 = ev.adjust(sim, scen0, frac=frac, power=power)
        sv0 = np.asarray(scen0.data)
        sv2 = np.asarray(scen2.data)
        exval = sim_v > thresh
        # extreme values of sim stay extreme after second-order adjustment
        assert (sv2[exval] > thresh).sum() >= (sv0[exval] > thresh).sum()
        assert np.isfinite(sv2).all()

    def test_output_attrs(self, random):
        n = 1200
        v = random.gamma(2, 2, n)
        ref, hist = series(v), series(v * 0.8)
        ev = ExtremeValues.train(ref, hist, cluster_thresh="1 mm/d")
        scen = ev.adjust(hist, series(v * 0.9))
        assert "bias_adjustment" in scen.attrs
        assert scen.attrs["units"] == "mm/d"


class TestPCA:
    def test_pc_matrix_properties(self, random):
        x = random.multivariate_normal([0, 0], [[2.0, 1.0], [1.0, 1.5]], size=5000).T
        E = np.asarray(pc_matrix(x))
        # E @ E.T should reconstruct the covariance (eigendecomposition)
        np.testing.assert_allclose(E @ E.T, np.cov(x), rtol=0.1, atol=0.05)

    def test_bivariate_recovery(self, random):
        """Reference-style: hist is a linearly transformed ref; PCA maps
        hist back onto ref's distribution."""
        n = 4000
        ref_v = random.multivariate_normal([10, 20], [[2.0, 1.2], [1.2, 1.5]], size=n).T
        A = np.array([[1.5, 0.0], [0.3, 0.8]])
        hist_v = A @ (ref_v - ref_v.mean(1, keepdims=True)) + np.array([[15], [18]])
        t = date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
        mkda = lambda v: DataArray(v, ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {"units": "K"}, "x")
        ref, hist = mkda(ref_v), mkda(hist_v)
        pca = PrincipalComponents.train(ref, hist, crd_dim="multivar", group="time")
        scen = pca.adjust(hist)
        sv = np.asarray(scen.data)
        np.testing.assert_allclose(sv.mean(1), ref_v.mean(1), atol=0.1)
        np.testing.assert_allclose(np.cov(sv), np.cov(ref_v), rtol=0.1, atol=0.1)

    @pytest.mark.parametrize("orientation", ["simple", "full"])
    def test_orientations(self, random, orientation):
        n = 1000
        ref_v = random.multivariate_normal([0, 0], [[1.0, 0.5], [0.5, 1.0]], size=n).T
        hist_v = ref_v * 1.3 + 2
        t = date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
        mkda = lambda v: DataArray(v, ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {"units": "K"}, "x")
        pca = PrincipalComponents.train(mkda(ref_v), mkda(hist_v), crd_dim="multivar", best_orientation=orientation)
        scen = pca.adjust(mkda(hist_v))
        sv = np.asarray(scen.data)
        # orientation chosen correctly -> positive correlation with hist
        assert np.corrcoef(sv[0], hist_v[0])[0, 1] > 0.9

    def test_monthly_group(self, random):
        n = 365 * 3
        ref_v = random.multivariate_normal([0, 0], [[1.0, 0.3], [0.3, 1.0]], size=n).T
        hist_v = ref_v * 2 + 1
        t = date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
        mkda = lambda v: DataArray(v, ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {"units": "K"}, "x")
        pca = PrincipalComponents.train(mkda(ref_v), mkda(hist_v), crd_dim="multivar", group="time.month")
        assert pca.ds["trans"].shape == (12, 2, 2)
        scen = pca.adjust(mkda(hist_v))
        assert np.asarray(scen.data).std() == pytest.approx(np.asarray(ref_v).std(), rel=0.1)


@pytest.mark.slow
def test_ref_params_reuse(random):
    """Train once, reuse the fitted ref GPD in a second training
    (reference ref_params option)."""
    n = 1500
    v = random.gamma(2, 3, n)
    ref, hist = series(v), series(v * 0.8)
    ev1 = ExtremeValues.train(ref, hist, cluster_thresh="1 mm/d", q_thresh=0.9)
    assert "ref_params" in ev1.ds
    ev2 = ExtremeValues.train(ref, series(v * 0.7), cluster_thresh="1 mm/d", q_thresh=0.9, ref_params=ev1.ds)
    # ref fit identical, hist fit different
    np.testing.assert_allclose(np.asarray(ev2.ds["ref_params"].data), np.asarray(ev1.ds["ref_params"].data), rtol=1e-6)
    s2 = ev2.adjust(hist, series(v * 0.9))
    assert np.isfinite(np.asarray(s2.data)).all()


class TestExtremeValuesScalability:
    def test_cluster_bound_matches_reference_overallocation(self):
        from xsdba_tpu.models.extremes import _cluster_bound

        # (1-q)*T*1.05 (reference adjustment.py:856), not T//2
        assert _cluster_bound(54750, 0.95) == int(0.05 * 54750 * 1.05) + 8
        assert _cluster_bound(54750, 0.95) < 54750 // 2 / 9

    def test_only_qualifying_clusters_consume_labels(self):
        import jax.numpy as jnp

        from xsdba_tpu.ops.clusters import cluster_fields

        # many u2-runs, few qualifying (> u1): with max_clusters smaller than
        # the u2-run count, all qualifying clusters must still be found
        x = np.zeros(1000)
        x[::4] = 1.0          # 250 runs above u2=0.5
        x[100] = 5.0          # two qualifying clusters (> u1=2)
        x[800] = 7.0
        out = cluster_fields(jnp.asarray(x), 2.0, 0.5, max_clusters=8)
        mx = np.asarray(out["maximum"])
        assert int(np.asarray(out["nclusters"])) == 2
        np.testing.assert_allclose(mx[:2], [5.0, 7.0])
        assert np.isnan(mx[2:]).all()

    @pytest.mark.slow
    def test_long_series_train(self, random):
        """150-yr daily train works with the (1-q)T bound and padded-length
        bucketing (one compile per 4096-length bucket)."""
        import xsdba_tpu as xt

        T = 365 * 150
        t = xt.date_range("1850-01-01", periods=T, freq="D", calendar="noleap")
        base = random.gamma(2, 5, T)
        mk = lambda v: xt.DataArray(v, ("time",), {"time": t}, {"units": "mm/d"}, "pr")
        ev = xt.ExtremeValues.train(mk(base), mk(base * 1.3), cluster_thresh="20 mm/d", q_thresh=0.95)
        af = np.asarray(ev.ds["af"].data)
        assert af.shape[-1] == int(0.05 * T * 1.05)
        assert np.isfinite(af).sum() > 100
        scen = ev.adjust(mk(base * 1.3), mk(base * 1.25))
        assert np.asarray(scen.data).shape == (T,)
