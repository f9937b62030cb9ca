"""One integration pass over every adjustment class — the 'does the whole
surface run' test a reference user would try first."""

import numpy as np
import pytest
from scipy import stats

import xsdba_tpu as xt
from xsdba_tpu.models import (
    LOCI,
    OTC,
    DetrendedQuantileMapping,
    EmpiricalQuantileMapping,
    ExtremeValues,
    MBCn,
    NpdfTransform,
    PrincipalComponents,
    QuantileDeltaMapping,
    Scaling,
    dOTC,
)
from xsdba_tpu.processing import stack_variables


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 365 * 3
    t = xt.date_range("1990-01-01", periods=n, freq="D", calendar="noleap")
    t2 = xt.date_range("2050-01-01", periods=n, freq="D", calendar="noleap")
    u = rng.random(n)
    mk = lambda v, u_, time: xt.DataArray(np.asarray(v, float), ("time",), {"time": time}, {"units": u_}, "x")
    ref = mk(stats.gamma.ppf(u, 4, scale=2) + 0.1, "mm/d", t)
    hist = mk(stats.gamma.ppf(u, 6, scale=1.5) + 0.1, "mm/d", t)
    sim = mk(stats.gamma.ppf(rng.random(n), 7, scale=1.6) + 0.1, "mm/d", t2)
    bi = lambda mean, time: stack_variables(
        xt.Dataset(
            {
                "tas": xt.DataArray(rng.normal(mean, 1, n), ("time",), {"time": time}, {"units": "K"}, "tas"),
                "pr": xt.DataArray(rng.gamma(2, 2, n), ("time",), {"time": time}, {"units": "mm/d"}, "pr"),
            }
        )
    )
    return {"ref": ref, "hist": hist, "sim": sim, "mv_ref": bi(0, t), "mv_hist": bi(1, t), "mv_sim": bi(1.5, t2)}


def _check(scen):
    v = np.asarray(scen.data)
    assert np.isfinite(v).all()
    assert "history" in scen.attrs and "bias_adjustment" in scen.attrs
    return v


def test_every_trainadjust_class(data):
    ref, hist, sim = data["ref"], data["hist"], data["sim"]

    _check(EmpiricalQuantileMapping.train(ref, hist, kind="*", nquantiles=15).adjust(sim, interp="linear"))
    _check(QuantileDeltaMapping.train(ref, hist, kind="*", nquantiles=15).adjust(sim))
    _check(DetrendedQuantileMapping.train(ref, hist, kind="*", nquantiles=15).adjust(sim, detrend=1))
    _check(Scaling.train(ref, hist, kind="*", group="time.month").adjust(sim))
    _check(LOCI.train(ref, hist, thresh="1 mm/d").adjust(sim))
    ev = ExtremeValues.train(ref, hist, cluster_thresh="1 mm/d", q_thresh=0.9)
    scen0 = EmpiricalQuantileMapping.train(ref, hist, kind="*", nquantiles=15).adjust(sim)
    _check(ev.adjust(sim, scen0, frac=0.5, power=2))


def test_every_multivariate_class(data):
    mv_ref, mv_hist, mv_sim = data["mv_ref"], data["mv_hist"], data["mv_sim"]

    _check(PrincipalComponents.train(mv_ref, mv_hist, crd_dim="multivar").adjust(mv_hist))
    _check(NpdfTransform.adjust(mv_ref, mv_hist, n_iter=3, n_escore=-1))
    mbcn = MBCn.train(mv_ref, mv_hist, base_kws={"nquantiles": 10}, n_iter=3, n_escore=-1)
    _check(mbcn.adjust(mv_sim, mv_ref, mv_hist))
    _check(OTC.adjust(mv_ref, mv_hist, bin_width=0.5))
    _check(dOTC.adjust(mv_ref, mv_hist, mv_sim, bin_width=0.5))
