"""End-to-end exercise of the SBCK wrapper gateway with a stand-in module.

SBCK itself (Eigen/C++, optional upstream dependency) is not installable
here; a minimal fit/predict-compatible fake drives the full discovery ->
wrap -> Adjust pipeline, pinning the gateway machinery (reference
``adjustment.py:1976-2076``) beyond the ImportError path.
"""

import sys
import types

import numpy as np
import pytest

from xsdba_tpu import DataArray, date_range
from xsdba_tpu.models.sbck import generate_sbck_classes


class _FakeQM:
    """Quantile-mapping stand-in with SBCK's fit/predict calling convention
    (data as [time, variables] arrays)."""

    def __init__(self, delta: float = 0.0):
        self.delta = delta

    def fit(self, Y0, X0, X1):
        self.shift = np.mean(Y0, axis=0) - np.mean(X0, axis=0)

    def predict(self, X1):
        return X1 + self.shift + self.delta


class _NotAModel:
    pass


@pytest.fixture
def fake_sbck(monkeypatch):
    mod = types.ModuleType("SBCK")
    mod.QM = _FakeQM
    mod.NotAModel = _NotAModel
    mod.some_function = lambda: None
    monkeypatch.setitem(sys.modules, "SBCK", mod)
    return mod


def _mk(v, dims=("time",), units="K"):
    t = date_range("2000-01-01", periods=np.shape(v)[-1], freq="D", calendar="noleap")
    coords = {"time": t}
    for d, s in zip(dims[:-1], np.shape(v)[:-1]):
        coords[d] = np.arange(s)
    return DataArray(np.asarray(v, dtype=float), dims, coords, {"units": units}, "tas")


class TestSBCKGateway:
    def test_missing_dependency_raises(self):
        sys.modules.pop("SBCK", None)
        with pytest.raises(ImportError, match="SBCK"):
            generate_sbck_classes()

    def test_discovery_wraps_fit_predict_classes_only(self, fake_sbck):
        classes = dict(generate_sbck_classes())
        assert "SBCK_QM" in classes
        assert "SBCK_NotAModel" not in classes

    def test_univariate_adjust(self, fake_sbck, random):
        classes = dict(generate_sbck_classes())
        ref = _mk(random.normal(10, 1, 365))
        hist = _mk(random.normal(12, 1, 365))
        sim = _mk(random.normal(12, 1, 365))
        scen = classes["SBCK_QM"].adjust(ref, hist, sim)
        assert scen.dims == sim.dims and scen.shape == sim.shape
        # the fake maps by mean shift: scen mean ~ sim mean + (ref - hist) means
        want = np.asarray(sim.data) + (np.asarray(ref.data).mean() - np.asarray(hist.data).mean())
        np.testing.assert_allclose(np.asarray(scen.data), want, rtol=1e-12)
        assert "bias_adjustment" in scen.attrs

    def test_multivariate_adjust(self, fake_sbck, random):
        classes = dict(generate_sbck_classes())
        ref = _mk(random.normal(10, 1, (2, 365)), dims=("multivar", "time"))
        hist = _mk(random.normal(12, 1, (2, 365)), dims=("multivar", "time"))
        sim = _mk(random.normal(12, 1, (2, 365)), dims=("multivar", "time"))
        scen = classes["SBCK_QM"].adjust(ref, hist, sim, multi_dim="multivar")
        assert scen.shape == sim.shape
        shift = np.asarray(ref.data).mean(axis=-1) - np.asarray(hist.data).mean(axis=-1)
        want = np.asarray(sim.data) + shift[:, None]
        np.testing.assert_allclose(np.asarray(scen.data), want, rtol=1e-12)

    def test_kwargs_forwarded(self, fake_sbck, random):
        classes = dict(generate_sbck_classes())
        ref = _mk(random.normal(10, 1, 100))
        hist = _mk(random.normal(10, 1, 100))
        sim = _mk(random.normal(10, 1, 100))
        s0 = classes["SBCK_QM"].adjust(ref, hist, sim, delta=0.0)
        s5 = classes["SBCK_QM"].adjust(ref, hist, sim, delta=5.0)
        np.testing.assert_allclose(np.asarray(s5.data) - np.asarray(s0.data), 5.0, rtol=1e-12)


class _FakeCoupledQM:
    """Shift model whose fit couples all columns (scalar global-mean shift):
    distinguishes one joint fit from per-series fits."""

    def fit(self, Y0, X0, X1):
        self.shift = float(np.mean(Y0) - np.mean(X0))

    def predict(self, X1):
        return X1 + self.shift


def test_non_multidim_vectorizes_per_series(monkeypatch):
    """Without multi_dim, every extra dim is a SEPARATE univariate fit (the
    reference's apply_ufunc(vectorize=True)) — a joint [time, sites] fit
    would couple the sites."""
    import types

    mod = types.ModuleType("SBCK")
    mod.QM = _FakeCoupledQM
    monkeypatch.setitem(sys.modules, "SBCK", mod)
    from xsdba_tpu.models.sbck import generate_sbck_classes

    (name, cls), = generate_sbck_classes()
    ref = _mk(np.stack([np.full(30, 10.0), np.full(30, 100.0)]), ("site", "time"))
    hist = _mk(np.stack([np.full(30, 12.0), np.full(30, 110.0)]), ("site", "time"))
    scen = cls.adjust(ref, hist, hist.copy())
    sv = np.asarray(scen.data)
    # per-series: site 0 shifted by -2, site 1 by -10 (a joint fit would
    # apply the same pooled -6 shift to both)
    np.testing.assert_allclose(sv[0], np.full(30, 10.0), atol=1e-12)
    np.testing.assert_allclose(sv[1], np.full(30, 100.0), atol=1e-12)
