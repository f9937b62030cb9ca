"""End-to-end mirror of the reference docs' advanced-example chain
(docs/notebooks/advanced_example.ipynb "Full example"): jitter -> additive
space -> stack_variables -> grouped normalize/scale -> LOESS detrend ->
PrincipalComponents -> EQM -> retrend -> unstack -> physical space.

Exercises the whole public workflow surface a reference user relies on,
including label-based time selection.
"""

import numpy as np
import pytest

import xsdba_tpu as xt
from xsdba_tpu import DataArray, Dataset, date_range
from xsdba_tpu.detrending import PolyDetrend
from xsdba_tpu.processing import (
    from_additive_space,
    jitter,
    normalize,
    stack_variables,
    to_additive_space,
    unstack_variables,
)
from xsdba_tpu.utils.grouper import Grouper


def _mk(seed, years=6, tas_mu=15.0, pr_scale=2.0):
    rng = np.random.default_rng(seed)
    t = date_range("2001-01-01", periods=365 * years, freq="D", calendar="noleap")
    doy = np.asarray(t.dayofyear)
    cycle = 10 * np.cos(2 * np.pi * (doy - 200) / 365)
    tas = tas_mu + cycle + rng.normal(0, 2, t.size) + 273.15
    pr = np.clip(rng.gamma(2.0, pr_scale, t.size) - 1.0, 0, None)
    mk = lambda v, u, n: DataArray(v, ("time",), {"time": t}, {"units": u}, n)
    return Dataset({"tasmax": mk(tas, "K", "tasmax"), "pr": mk(pr, "mm/d", "pr")})


class TestSel:
    def test_time_slice_partial_dates(self):
        ds = _mk(0)
        da = ds["tasmax"]
        sub = da.sel(time=slice("2002", "2003"))
        assert sub.sizes["time"] == 365 * 2
        assert int(sub.time.year[0]) == 2002 and int(sub.time.year[-1]) == 2003
        sub2 = da.sel(time=slice("2002-03", "2002-05"))
        assert int(sub2.time.month[0]) == 3 and int(sub2.time.month[-1]) == 5
        sub3 = da.sel(time=slice(None, "2001-01-10"))
        assert sub3.sizes["time"] == 10

    def test_label_and_dataset_sel(self):
        t = date_range("2000-01-01", periods=10, freq="D", calendar="noleap")
        da = DataArray(
            np.arange(30.0).reshape(3, 10),
            ("site", "time"),
            {"time": t, "site": np.array(["a", "b", "c"])},
            {},
            "x",
        )
        one = da.sel(site="b")
        assert one.dims == ("time",)
        np.testing.assert_array_equal(np.asarray(one.data), np.arange(10.0) + 10)
        two = da.sel(site=["a", "c"])
        assert two.shape == (2, 10)
        ds = Dataset({"x": da})
        np.testing.assert_array_equal(np.asarray(ds.sel(site="c")["x"].data), np.arange(10.0) + 20)
        with pytest.raises(KeyError):
            da.sel(site="zz")


@pytest.mark.slow
def test_advanced_notebook_chain(random):
    group = Grouper("time.dayofyear", window=31)
    dref = _mk(1, tas_mu=15.0, pr_scale=2.0)
    dsim = _mk(2, tas_mu=17.0, pr_scale=2.6)  # biased model

    def to_as(ds):
        pr_j = jitter(ds["pr"], lower="0.1 mm/d", minimum="0 mm/d")
        pr_as = to_additive_space(pr_j, lower_bound="0 mm/d", trans="log")
        return stack_variables(Dataset({"tasmax": ds["tasmax"], "pr": pr_as}))

    ref = to_as(dref)
    sim = to_as(dsim)
    hist = sim.sel(time=slice("2001", "2004"))
    ref_fit = ref.sel(time=slice("2001", "2004"))

    # grouped normalize + scaling correction (notebook cells 3-4)
    ref_res, ref_norm = normalize(ref_fit, group=group, kind="+")
    hist_res, hist_norm = normalize(hist, group=group, kind="+")
    scaling = xt.utils.get_correction(np.asarray(hist_norm.data), np.asarray(ref_norm.data), "+")
    scaling_da = DataArray(scaling, hist_norm.dims, dict(hist_norm.coords), {}, "scaling")
    sim_scaled = xt.utils.apply_correction(
        np.asarray(sim.move_dim_last("time").data),
        np.asarray(xt.utils.broadcast(scaling_da, sim, group=group, interp="nearest").data),
        "+",
    )
    sim_scaled = DataArray(sim_scaled, sim.move_dim_last("time").dims, dict(sim.move_dim_last("time").coords), dict(sim.attrs), sim.name)
    sim_scaled.attrs["units"] = ""

    # detrend (Poly stands in for the notebook's LOESS at test scale)
    detr = PolyDetrend(degree=1, kind="+", group=group)
    fit = detr.fit(sim_scaled)
    sim_res = fit.detrend(sim_scaled)

    # PCA then EQM on the residuals (notebook cells 5-6)
    pca = xt.PrincipalComponents.train(ref_res, hist_res, group=group, crd_dim="multivar", best_orientation="simple")
    scen1_res = pca.adjust(sim_res)
    eqm = xt.EmpiricalQuantileMapping.train(
        ref_res, scen1_res.sel(time=slice("2001", "2004")), group=group, nquantiles=20, kind="+", skip_input_checks=True
    )
    scen2_res = eqm.adjust(scen1_res, interp="linear", extrapolation="constant", skip_input_checks=True)

    # retrend, unstack, back to physical space (notebook cell 7)
    scen = fit.retrend(scen2_res)
    dscen_as = unstack_variables(scen)
    pr_phys = from_additive_space(dscen_as["pr"])
    tas_scen = dscen_as["tasmax"]

    assert pr_phys.sizes["time"] == sim.sizes["time"]
    pr_v = np.asarray(pr_phys.data)
    assert np.isfinite(pr_v).all() and (pr_v >= 0).all()

    # the adjustment must pull the simulated climatology toward ref on the
    # training window: compare doy-mean absolute bias before/after for tas
    tshist = slice("2001", "2004")
    ref_tas = np.asarray(dref["tasmax"].sel(time=tshist).data)
    raw_tas = np.asarray(dsim["tasmax"].sel(time=tshist).data)
    adj_tas = np.asarray(tas_scen.sel(time=tshist).data)
    bias_raw = abs(raw_tas.mean() - ref_tas.mean())
    bias_adj = abs(adj_tas.mean() - ref_tas.mean())
    assert bias_adj < 0.25 * bias_raw, (bias_raw, bias_adj)
