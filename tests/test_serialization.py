"""Checkpoint round-trips for every trained scheme (reference
tests/test_adjustment.py:443-452 contract, extended)."""

import numpy as np
import pytest
from scipy import stats

import xsdba_tpu as xt
from xsdba_tpu.models import (
    LOCI,
    DetrendedQuantileMapping,
    EmpiricalQuantileMapping,
    ExtremeValues,
    MBCn,
    PrincipalComponents,
    QuantileDeltaMapping,
    Scaling,
)
from xsdba_tpu.processing import stack_variables


def series(values, units="K", calendar="noleap"):
    t = xt.date_range("2000-01-01", periods=len(values), freq="D", calendar=calendar)
    return xt.DataArray(np.asarray(values, float), ("time",), {"time": t}, {"units": units}, "x")


@pytest.mark.parametrize(
    "cls,kwargs,units",
    [
        (EmpiricalQuantileMapping, {"group": "time.month", "nquantiles": 10}, "K"),
        (QuantileDeltaMapping, {"kind": "*", "nquantiles": 10}, "mm/d"),
        (DetrendedQuantileMapping, {"nquantiles": 10}, "K"),
        (Scaling, {"group": "time.season"}, "K"),
        (LOCI, {"thresh": "1 mm/d"}, "mm/d"),
        (ExtremeValues, {"cluster_thresh": "1 mm/d"}, "mm/d"),
    ],
)
def test_roundtrip(tmp_path, random, cls, kwargs, units):
    n = 365 * 2
    u = random.random(n)
    if units == "mm/d":
        ref = series(stats.gamma.ppf(u, 2, scale=2) + 0.01, units)
        hist = series(stats.gamma.ppf(u, 2, scale=1.5) + 0.01, units)
    else:
        ref = series(stats.norm.ppf(u, 10, 1), units)
        hist = series(stats.norm.ppf(u, 12, 2), units)
    obj = cls.train(ref, hist, **kwargs)
    path = str(tmp_path / "ckpt.npz")
    obj.save(path)
    restored = cls.from_file(path)
    assert type(restored) is cls
    if cls is ExtremeValues:
        s1 = obj.adjust(hist, hist, frac=0.5, power=2)
        s2 = restored.adjust(hist, hist, frac=0.5, power=2)
    else:
        s1 = obj.adjust(hist)
        s2 = restored.adjust(hist)
    np.testing.assert_allclose(np.asarray(s1.data), np.asarray(s2.data), rtol=1e-10, equal_nan=True)


def test_mbcn_roundtrip(tmp_path, random):
    n = 365 * 2
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    vals = random.multivariate_normal([0, 0], [[1, 0.5], [0.5, 1]], size=n).T
    mk = lambda v, u, nm: xt.DataArray(v, ("time",), {"time": t}, {"units": u}, nm)
    ref = stack_variables(xt.Dataset({"tas": mk(vals[0], "K", "tas"), "pr": mk(vals[1] + 10, "mm/d", "pr")}))
    vals2 = random.multivariate_normal([1, 1], [[1, 0.2], [0.2, 1]], size=n).T
    hist = stack_variables(xt.Dataset({"tas": mk(vals2[0], "K", "tas"), "pr": mk(vals2[1] + 10, "mm/d", "pr")}))
    mbcn = MBCn.train(ref, hist, base_kws={"nquantiles": 10}, n_iter=4, n_escore=-1)
    path = str(tmp_path / "mbcn.npz")
    mbcn.save(path)
    restored = MBCn.from_file(path)
    assert type(restored) is MBCn
    np.testing.assert_allclose(
        np.asarray(restored.ds["af_q"].data), np.asarray(mbcn.ds["af_q"].data), rtol=1e-7
    )
    s1 = mbcn.adjust(hist, ref, hist)
    s2 = restored.adjust(hist, ref, hist)
    np.testing.assert_allclose(np.asarray(s1.data), np.asarray(s2.data), rtol=1e-6)


def test_pca_roundtrip(tmp_path, random):
    n = 1000
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    ref_v = random.multivariate_normal([0, 0], [[1, 0.5], [0.5, 1]], size=n).T
    hist_v = ref_v * 1.4 + 1
    mk = lambda v: xt.DataArray(v, ("multivar", "time"), {"time": t, "multivar": np.array(["a", "b"])}, {"units": "K"}, "x")
    pca = PrincipalComponents.train(mk(ref_v), mk(hist_v), crd_dim="multivar")
    path = str(tmp_path / "pca.npz")
    pca.save(path)
    restored = PrincipalComponents.from_file(path)
    s1 = pca.adjust(mk(hist_v))
    s2 = restored.adjust(mk(hist_v))
    np.testing.assert_allclose(np.asarray(s1.data), np.asarray(s2.data), rtol=1e-10)


def test_grouper_add_dims_json_roundtrip():
    """Grouper serialization must carry add_dims (pooled-dimension grouping
    would otherwise be silently dropped by save/from_file)."""
    from xsdba_tpu.utils.grouper import Grouper
    from xsdba_tpu.utils.params import _decode_param, _encode_param

    g = Grouper("time.month", add_dims=["realization"])
    g2 = _decode_param(_encode_param(g))
    assert list(g2.add_dims) == ["realization"]
    assert g2.name == g.name and g2.window == g.window
    g3 = _decode_param(_encode_param(Grouper("time.dayofyear", window=5)))
    assert not g3.add_dims
