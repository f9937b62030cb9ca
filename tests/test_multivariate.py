import numpy as np
import pytest

from xsdba_tpu import DataArray, Dataset, date_range, set_options
from xsdba_tpu.models import MBCn, NpdfTransform
from xsdba_tpu.ops.escore import escore as escore_core
from xsdba_tpu.ops.rotation import rand_rot_matrix
from xsdba_tpu.processing import escore, stack_variables, unstack_variables


def bivariate(rng, n, mean, cov, start="2000-01-01"):
    t = date_range(start, periods=n, freq="D", calendar="noleap")
    vals = rng.multivariate_normal(mean, cov, size=n).T  # [2, n]
    ds = Dataset(
        {
            "tas": DataArray(vals[0], ("time",), {"time": t}, {"units": "K"}, "tas"),
            "pr": DataArray(vals[1] + 20, ("time",), {"time": t}, {"units": "mm/d"}, "pr"),
        }
    )
    return stack_variables(ds)


def test_rand_rot_matrix_orthogonal():
    R = np.asarray(rand_rot_matrix(4, num=3))
    assert R.shape == (3, 4, 4)
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(4), atol=1e-5)
        # Haar-orthogonal (the reference's Mezzadri construction likewise
        # yields det = +-1, utils.py:963-974)
        assert abs(np.linalg.det(r)) == pytest.approx(1.0, abs=1e-5)


def test_escore_matches_naive(random):
    from scipy.spatial.distance import cdist

    x = random.normal(size=(3, 40))
    y = random.normal(0.5, 1, size=(3, 50))
    got = float(escore_core(x, y))
    dxy = cdist(x.T, y.T).mean()
    dxx = cdist(x.T, x.T).sum() / 40**2
    dyy = cdist(y.T, y.T).sum() / 50**2
    n1, n2 = 50, 40
    want = n1 * n2 / (n1 + n2) * (2 * dxy - dxx - dyy) / 2
    assert got == pytest.approx(want, rel=1e-6)


def test_escore_nan_and_identical(random):
    x = random.normal(size=(2, 30))
    assert float(escore_core(x, x)) == pytest.approx(0.0, abs=1e-10)
    y = x.copy()
    y[0, 3] = np.nan  # column 3 excluded
    got = float(escore_core(x, y))
    assert np.isfinite(got)


def test_stack_unstack_roundtrip(random):
    t = date_range("2000-01-01", periods=100, freq="D")
    ds = Dataset(
        {
            "tas": DataArray(random.normal(280, 5, 100), ("time",), {"time": t}, {"units": "K"}, "tas"),
            "pr": DataArray(random.random(100), ("time",), {"time": t}, {"units": "mm/d"}, "pr"),
        }
    )
    da = stack_variables(ds)
    assert da.dims == ("multivar", "time")
    assert list(np.asarray(da.coords["multivar"])) == ["pr", "tas"]  # alphabetical
    assert da.attrs["units"] == ""
    back = unstack_variables(da)
    np.testing.assert_allclose(np.asarray(back["tas"].data), np.asarray(ds["tas"].data))
    assert back["tas"].attrs["units"] == "K"
    assert back["pr"].attrs["units"] == "mm/d"


class TestNpdfTransform:
    def test_recovers_multivariate_structure(self, random):
        n = 2000
        cov_ref = np.array([[1.0, 0.7], [0.7, 1.0]])
        cov_hist = np.array([[2.0, -0.4], [-0.4, 1.0]])
        ref = bivariate(random, n, [0, 0], cov_ref)
        hist = bivariate(random, n, [2, 1], cov_hist)
        with set_options(extra_output=True):
            out = NpdfTransform.adjust(ref, hist, n_iter=15, n_escore=100)
        assert "scenh" in out and "escores" in out
        scen = np.asarray(out["scen"].data)
        refv = np.asarray(ref.data)
        # correlation structure of scen approaches ref's
        corr_scen = np.corrcoef(scen)[0, 1]
        corr_ref = np.corrcoef(refv)[0, 1]
        assert corr_scen == pytest.approx(corr_ref, abs=0.1)
        # final escore is well below the raw ref-vs-hist dissimilarity
        esc = np.asarray(out["escores"].data)
        e0 = float(np.asarray(escore(ref, hist, N=100, scale=True).data))
        assert esc[-1] < 0.5 * e0

    def test_plain_output(self, random):
        ref = bivariate(random, 400, [0, 0], np.eye(2))
        hist = bivariate(random, 400, [1, 1], np.eye(2))
        scen = NpdfTransform.adjust(ref, hist, n_iter=5, n_escore=-1)
        assert scen.dims == ("multivar", "time")


class TestMBCn:
    @pytest.mark.parametrize(
        "group,window",
        [
            ("time", 1),
            pytest.param("time.dayofyear", 31, marks=pytest.mark.slow),
            pytest.param("5D", 3, marks=pytest.mark.slow),
        ],
    )
    def test_train_adjust(self, random, group, window):
        n = 365 * 3
        cov_ref = np.array([[1.0, 0.6], [0.6, 1.0]])
        cov_hist = np.array([[1.5, -0.2], [-0.2, 1.2]])
        ref = bivariate(random, n, [0, 0], cov_ref)
        hist = bivariate(random, n, [2, 1], cov_hist)
        sim = bivariate(random, n, [2.5, 1.2], cov_hist, start="2010-01-01")

        mbcn = MBCn.train(ref, hist, base_kws={"nquantiles": 20, "group": group, "window": window} if window > 1 else {"nquantiles": 20, "group": group}, n_iter=8, n_escore=-1)
        assert "af_q" in mbcn.ds and "rot_matrices" in mbcn.ds
        scen = mbcn.adjust(sim, ref, hist)
        sv = np.asarray(scen.data)
        assert sv.shape == np.asarray(sim.data).shape
        assert np.isfinite(sv).all()
        if group == "time":
            corr_scen = np.corrcoef(sv)[0, 1]
            corr_ref = np.corrcoef(np.asarray(ref.data))[0, 1]
            assert corr_scen == pytest.approx(corr_ref, abs=0.15)

    @pytest.mark.slow
    def test_escore_decreases(self, random):
        n = 1500
        ref = bivariate(random, n, [0, 0], np.array([[1.0, 0.8], [0.8, 1.0]]))
        hist = bivariate(random, n, [1, -1], np.array([[1.0, -0.5], [-0.5, 1.0]]))
        mbcn = MBCn.train(ref, hist, base_kws={"nquantiles": 30}, n_iter=10, n_escore=150)
        esc = np.asarray(mbcn.ds["escores"].data)[0]
        e0 = float(np.asarray(escore(ref, hist, N=150, scale=True).data))
        assert esc[-1] < 0.5 * e0

    def test_month_group_rejected(self, random):
        ref = bivariate(random, 365, [0, 0], np.eye(2))
        hist = bivariate(random, 365, [1, 1], np.eye(2))
        with pytest.raises(NotImplementedError, match="Monthly"):
            MBCn.train(ref, hist, base_kws={"group": "time.month"})

    @pytest.mark.slow
    def test_mbcn_recovers_marginals(self, random):
        """With QDM base, each variable's marginal approaches ref's."""
        n = 365 * 4
        ref = bivariate(random, n, [0, 0], np.array([[1.0, 0.5], [0.5, 1.0]]))
        hist = bivariate(random, n, [3, 2], np.array([[2.0, 0.1], [0.1, 0.5]]))
        mbcn = MBCn.train(ref, hist, base_kws={"nquantiles": 30}, n_iter=10, n_escore=-1)
        scen = mbcn.adjust(hist, ref, hist)
        sv = np.asarray(scen.data)
        rv = np.asarray(ref.data)
        for i in range(2):
            assert sv[i].mean() == pytest.approx(rv[i].mean(), abs=0.2)
            assert sv[i].std() == pytest.approx(rv[i].std(), rel=0.15)


def test_escore_public_wrapper(random):
    t = date_range("2000-01-01", periods=300, freq="D")
    a = DataArray(random.normal(size=(2, 300)), ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {}, "x")
    b = DataArray(random.normal(1, 1, size=(2, 300)), ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {}, "y")
    e = escore(a, b, N=50, scale=True)
    assert np.isfinite(float(np.asarray(e.data)))


@pytest.mark.slow
def test_mbcn_period_dim(random):
    """MBCn with sim stacked into overlapping periods (reference
    tests/test_adjustment.py:1188-1219 period_dim path)."""
    from xsdba_tpu.processing import stack_periods

    n_hist = 365 * 4
    ref = bivariate(random, n_hist, [0, 0], np.array([[1.0, 0.5], [0.5, 1.0]]))
    hist = bivariate(random, n_hist, [1, 1], np.eye(2))
    # a long simulation, stacked into 4-year windows with 2-year stride... use
    # window=4, stride=4 (non-overlapping, reversible trivially)
    n_sim = 365 * 12
    sim_long = bivariate(random, n_sim, [1.5, 1.2], np.eye(2), start="2010-01-01")
    sim = stack_periods(sim_long, window=4, stride=4)
    # keep ref-length windows
    sim = sim.isel(time=np.arange(n_hist))
    assert sim.dims == ("multivar", "period", "time")

    mbcn = MBCn.train(ref, hist, base_kws={"nquantiles": 20, "group": "time"}, n_iter=5, n_escore=-1)
    scen = mbcn.adjust(sim, ref, hist, period_dim="period")
    assert scen.dims == sim.dims
    sv = np.asarray(scen.data)
    assert np.isfinite(sv).all()
    # marginals move toward ref's
    rv = np.asarray(ref.data)
    assert abs(sv[1].mean() - rv[1].mean()) < 0.5


@pytest.mark.slow
def test_npdf_grouped_base(random):
    """NpdfTransform with a seasonal-grouped QDM base."""
    ref = bivariate(random, 365 * 3, [0, 0], np.array([[1.0, 0.6], [0.6, 1.0]]))
    hist = bivariate(random, 365 * 3, [2, 1], np.array([[1.5, -0.2], [-0.2, 1.0]]))
    scen = NpdfTransform.adjust(ref, hist, n_iter=6, n_escore=-1, base_kws={"group": "time.season", "nquantiles": 20})
    sv = np.asarray(scen.data)
    assert np.isfinite(sv).all()
    corr_scen = np.corrcoef(sv)[0, 1]
    corr_ref = np.corrcoef(np.asarray(ref.data))[0, 1]
    assert abs(corr_scen - corr_ref) < 0.25


@pytest.mark.slow
def test_mbcn_train_chunked_matches(random, monkeypatch):
    """Group-chunked MBCn training must equal the single-pass result."""
    from xsdba_tpu.models import mbcn as mbcn_mod
    from xsdba_tpu.ops.rotation import rand_rot_matrix

    n = 365 * 2
    ref = bivariate(random, n, [0, 0], np.eye(2))
    hist = bivariate(random, n, [1, 1], np.eye(2))
    rot = np.asarray(rand_rot_matrix(2, num=3))
    kw = dict(base_kws={"nquantiles": 8, "group": "time.dayofyear", "window": 5}, n_iter=3, n_escore=-1, rot_matrices=rot)
    full = MBCn.train(ref, hist, **kw)
    scen_full = full.adjust(hist, ref, hist)
    monkeypatch.setattr(mbcn_mod, "_TRAIN_CHUNK_BUDGET", 2 * 5 * n // 4)  # force ~4+ chunks
    chunked = MBCn.train(ref, hist, **kw)
    np.testing.assert_allclose(
        np.asarray(chunked.ds["af_q"].data), np.asarray(full.ds["af_q"].data), rtol=1e-5, atol=1e-6
    )
    # adjust is chunked by the same budget and must match exactly
    scen_chunked = full.adjust(hist, ref, hist)
    np.testing.assert_allclose(
        np.asarray(scen_chunked.data), np.asarray(scen_full.data), rtol=1e-6, atol=1e-8
    )


class TestNpdfTransformArbitraryBase:
    def test_general_loop_matches_fast_eqm_path(self, random):
        """The arbitrary-base loop run with EQM must match the lax.scan fast
        path (same rotations): validates the general machinery against the
        fused one (reference adjustment.py:1283-1307 accepts any base)."""
        import jax.numpy as jnp

        from xsdba_tpu.models import EmpiricalQuantileMapping
        from xsdba_tpu.models.mbcn import _npdf_loop_general
        from xsdba_tpu.ops.rotation import rand_rot_matrix
        from xsdba_tpu.utils.grouper import Grouper

        n = 600
        ref = bivariate(random, n, [0, 0], np.array([[1.0, 0.5], [0.5, 1.0]]))
        hist = bivariate(random, n, [1, 1], np.array([[1.5, -0.2], [-0.2, 1.0]]))
        rot = rand_rot_matrix(2, num=4)

        with set_options(extra_output=True):
            fast = NpdfTransform.adjust(
                ref, hist,
                base=EmpiricalQuantileMapping,
                base_kws={"nquantiles": 15, "group": "time"},
                adj_kws={"interp": "linear", "extrapolation": "constant"},
                n_iter=4, n_escore=-1, rot_matrices=rot,
            )

        refa = jnp.moveaxis(jnp.asarray(ref.move_dim_last("time").data), 0, -2)
        hista = jnp.moveaxis(jnp.asarray(hist.move_dim_last("time").data), 0, -2)
        from xsdba_tpu.ops.correction import equally_spaced_nodes

        scenh, scens, _ = _npdf_loop_general(
            NpdfTransform, EmpiricalQuantileMapping,
            {"kind": "+"}, {"interp": "linear", "extrapolation": "constant"},
            Grouper("time"), equally_spaced_nodes(15),
            ref, hist, hist, refa, hista, hista.copy(),
            jnp.asarray(rot), -1,
        )
        fast_scenh = np.asarray(fast["scenh"].data)
        np.testing.assert_allclose(np.moveaxis(np.asarray(scenh), -2, 0), fast_scenh, rtol=1e-5, atol=1e-6)

    def test_dqm_base_runs_and_adjusts(self, random):
        """Any TrainAdjust base (here DQM) runs end-to-end and improves the
        correlation structure."""
        import warnings

        from xsdba_tpu.models import DetrendedQuantileMapping

        n = 1200
        cov_ref = np.array([[1.0, 0.7], [0.7, 1.0]])
        ref = bivariate(random, n, [0, 0], cov_ref)
        hist = bivariate(random, n, [2, 1], np.array([[2.0, -0.4], [-0.4, 1.0]]))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with set_options(extra_output=True):
                out = NpdfTransform.adjust(
                    ref, hist,
                    base=DetrendedQuantileMapping,
                    base_kws={"nquantiles": 20, "group": "time"},
                    adj_kws={"interp": "linear", "detrend": 1},
                    n_iter=8, n_escore=-1,
                )
        corr_scen = np.corrcoef(np.asarray(out["scen"].data))[0, 1]
        assert corr_scen == pytest.approx(0.7, abs=0.2)


@pytest.mark.slow
def test_mbcn_site_batch_and_dim_order(random):
    """MBCn accepts any dim order and extra batch dims; a site-batched run
    matches per-site runs with the same rotations."""
    from xsdba_tpu import DataArray, MBCn, date_range

    S, V, T = 3, 2, 365 * 2
    t = date_range("1981-01-01", periods=T, freq="D", calendar="noleap")
    mv = np.array(["pr", "tas"])

    def mk(seed):
        r = np.random.default_rng(seed)
        return DataArray(
            r.normal(10, 3, (S, V, T)),
            ("site", "multivar", "time"),
            {"time": t, "multivar": mv, "site": np.arange(S)},
            {"units": ""},
            "data",
        )

    kw = dict(base_kws={"nquantiles": 8, "group": "time"}, n_iter=2, n_escore=-1)
    obj = MBCn.train(mk(1), mk(2), **kw)
    assert obj.ds["af_q"].dims[0] == "site"
    scen = obj.adjust(mk(3), mk(1), mk(2))
    assert scen.dims == ("site", "multivar", "time")

    rot = np.asarray(obj.ds["rot_matrices"].data)
    one = lambda da, i: DataArray(
        np.asarray(da.data)[i], ("multivar", "time"), {"time": t, "multivar": mv}, {"units": ""}, "d"
    )
    r1, h1, s1 = mk(1), mk(2), mk(3)
    obj0 = MBCn.train(one(r1, 1), one(h1, 1), rot_matrices=rot, **kw)
    scen0 = obj0.adjust(one(s1, 1), one(r1, 1), one(h1, 1))
    np.testing.assert_allclose(np.asarray(scen.data)[1], np.asarray(scen0.data), rtol=1e-10, atol=1e-10)


def test_npdf_batched_escores_dims(random):
    """NpdfTransform with a site batch dim: escores carry [site, iterations]
    (wrapping them as 1-D used to crash after the whole adjustment ran)."""
    n, S = 300, 3
    t = date_range("2000-01-01", periods=n, freq="D", calendar="noleap")

    def mk(mu):
        v = random.normal(mu, 1, (S, n))
        p = random.normal(mu + 5, 1, (S, n))
        return stack_variables(
            Dataset(
                {
                    "tas": DataArray(v, ("site", "time"), {"time": t, "site": np.arange(S)}, {"units": "K"}, "tas"),
                    "pr": DataArray(p, ("site", "time"), {"time": t, "site": np.arange(S)}, {"units": "mm/d"}, "pr"),
                }
            )
        )

    with set_options(extra_output=True):
        out = NpdfTransform.adjust(mk(0.0), mk(2.0), n_iter=3, n_escore=50)
    esc = out["escores"]
    assert esc.dims == ("site", "iterations")
    assert np.asarray(esc.data).shape == (S, 3)
    assert np.isfinite(np.asarray(esc.data)).all()
