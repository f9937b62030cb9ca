"""Grouper ``add_dims`` pooled-training tests.

Mirrors the reference's add_dims cases (tests/test_adjustment.py:119-151,
202, 270-307): training statistics pool over the extra dims; adjust applies
the shared factors to every slice along them.
"""

import numpy as np
import pytest

from xsdba_tpu import DataArray, date_range
from xsdba_tpu.models import LOCI, EmpiricalQuantileMapping, Scaling
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.grouper import Grouper


def _mk(data, start="2000-01-01", units="K", dims=("member", "time"), calendar="noleap"):
    t = date_range(start, periods=np.shape(data)[-1], freq="D", calendar=calendar)
    coords = {"time": t}
    for d, s in zip(dims[:-1], np.shape(data)[:-1]):
        coords[d] = np.arange(s)
    return DataArray(np.asarray(data), dims, coords, {"units": units}, "tas")


class TestAddDims:
    def test_eqm_pooled_matches_manual(self, random):
        """EQM with add_dims=['member'] must equal quantiles over the pooled
        member x group sample (reference test_add_dims strategy)."""
        M, T = 3, 365 * 4
        ref = random.normal(10, 2, (M, T))
        hist = random.normal(12, 3, (M, T))
        r, h = _mk(ref), _mk(hist)
        eqm = EmpiricalQuantileMapping.train(
            r, h, group=Grouper("time.month", add_dims=["member"]), nquantiles=20, kind="+"
        )
        af = np.asarray(eqm.ds["af"].data)
        assert "member" not in eqm.ds["af"].dims
        assert af.shape == (12, 20)

        # manual oracle: pool members within each month
        t = r.time
        q = equally_spaced_nodes(20)
        for m in range(12):
            sel = np.asarray(t.month) == m + 1
            want = np.nanquantile(ref[:, sel], q) - np.nanquantile(hist[:, sel], q)
            np.testing.assert_allclose(af[m], want, rtol=1e-6, atol=1e-6)

        # adjust broadcasts shared factors over member
        scen = eqm.adjust(h, interp="linear")
        assert scen.dims == h.dims and scen.shape == h.shape

    def test_windowed_doy_with_add_dims(self, random):
        """Windowed dayofyear + add_dims pools window x member (and now rides
        the shared-sort merge plan — see test_expanded_merge_plan_parity)."""
        M, T = 2, 365 * 3
        ref = random.normal(0, 1, (M, T))
        hist = random.normal(1, 1, (M, T))
        r, h = _mk(ref), _mk(hist)
        g = Grouper("time.dayofyear", window=31, add_dims=["member"])
        eqm = EmpiricalQuantileMapping.train(r, h, group=g, nquantiles=10, kind="+")
        af = np.asarray(eqm.ds["af"].data)
        assert af.shape == (365, 10)

        # oracle for one interior doy: members x window pooled
        gi = Grouper("time.dayofyear", window=31).indexes(r.time)
        row = gi.gather_idx[100]
        row = row[row >= 0]
        pooled_ref = ref[:, row].ravel()
        pooled_hist = hist[:, row].ravel()
        q = equally_spaced_nodes(10)
        want = np.nanquantile(pooled_ref, q) - np.nanquantile(pooled_hist, q)
        np.testing.assert_allclose(af[100], want, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("with_nans", [False, True])
    def test_expanded_merge_plan_parity(self, random, with_nans):
        """The pooled (add_dims-expanded) merge plan matches the exact
        window-amplified gather+sort path on EVERY group, including the
        year-wrap edges, for finite and NaN-bearing data (to f64 lerp ULPs —
        the CPU fallback associates the interpolation differently; the Pallas
        path is bit-exact on hardware)."""
        from xsdba_tpu.ops.quantile import grouped_nan_quantile, windowed_group_quantile

        M, T = 3, 365 * 4
        x = random.normal(0, 1, (M, T))
        if with_nans:
            x[x > 1.7] = np.nan
        t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
        gi = Grouper("time.dayofyear", window=31).indexes(
            _mk(x, calendar="noleap").time
        )
        gx = gi.expand(M)
        assert gx.merge_plan is not None, "pooled plan must survive expand"
        assert gx.expand(M) is gx or gi.expand(M) is gx  # memoized identity
        q = equally_spaced_nodes(10)
        flat = np.asarray(x).reshape(-1)  # [M*T], copy-major as expand assumes
        merged = np.asarray(windowed_group_quantile(flat, gx.merge_plan, q))
        exact = np.asarray(grouped_nan_quantile(flat, gx.gather_idx, q))
        np.testing.assert_allclose(merged, exact, rtol=1e-12, atol=1e-13)

    def test_loci_member_pooling(self, random):
        """LOCI with add_dims=['member'] (reference test_adjustment.py:202)."""
        M, T = 3, 365 * 2
        ref = np.clip(random.normal(2, 2, (M, T)), 0, None)
        hist = np.clip(random.normal(3, 3, (M, T)), 0, None)
        r = _mk(ref, units="mm/d")
        h = _mk(hist, units="mm/d")
        loci = LOCI.train(r, h, group="time", thresh="1 mm/d", add_dims=["member"])
        assert "member" not in loci.ds["af"].dims
        scen = loci.adjust(h)
        assert scen.shape == h.shape
        assert np.isfinite(np.asarray(scen.data)).all()

    def test_scaling_pooled_mean(self, random):
        M, T = 4, 365 * 2
        ref = random.normal(8, 1, (M, T))
        hist = random.normal(11, 1, (M, T))
        r, h = _mk(ref), _mk(hist)
        sc = Scaling.train(r, h, group=Grouper("time.month", add_dims=["member"]), kind="+")
        af = np.asarray(sc.ds["af"].data)
        t = r.time
        for m in (1, 6, 12):
            sel = np.asarray(t.month) == m
            want = np.nanmean(ref[:, sel]) - np.nanmean(hist[:, sel])
            np.testing.assert_allclose(af[m - 1], want, rtol=1e-6, atol=1e-8)

    def test_add_dims_missing_raises(self, random):
        T = 365
        r = _mk(random.normal(0, 1, (2, T)))
        h = _mk(random.normal(0, 1, (2, T)))
        with pytest.raises(ValueError, match="needs to be a dimension"):
            EmpiricalQuantileMapping.train(
                r, h, group=Grouper("time.month", add_dims=["not_a_dim"]), nquantiles=5
            )

    def test_add_dims_broadcast_missing_on_one(self, random):
        """An add_dim absent from one input broadcasts it (xarray Dataset
        semantics in the reference's Grouper.group)."""
        M, T = 3, 365 * 2
        ref = random.normal(10, 2, (M, T))
        hist1d = random.normal(12, 3, T)
        r = _mk(ref)
        t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
        h = DataArray(hist1d, ("time",), {"time": t}, {"units": "K"}, "tas")
        eqm = EmpiricalQuantileMapping.train(
            r, h, group=Grouper("time.month", add_dims=["member"]), nquantiles=10, kind="+"
        )
        af = np.asarray(eqm.ds["af"].data)
        q = equally_spaced_nodes(10)
        sel = np.asarray(r.time.month) == 1
        # the missing dim is broadcast, i.e. hist is tiled M times before
        # pooling — exactly what xarray's Dataset broadcast does upstream
        want = np.nanquantile(ref[:, sel], q) - np.nanquantile(np.tile(hist1d[sel], M), q)
        np.testing.assert_allclose(af[0], want, rtol=1e-6, atol=1e-6)

    def test_grouper_apply_add_dims(self, random):
        M, T = 2, 365
        x = random.normal(0, 1, (M, T))
        da = _mk(x)
        g = Grouper("time.month", add_dims=["member"])
        out = g.apply("mean", da)
        assert out.dims == ("month",)
        sel = np.asarray(da.time.month) == 3
        np.testing.assert_allclose(np.asarray(out.data)[2], x[:, sel].mean(), rtol=1e-7)
        # main_only skips the extra dims
        out2 = g.apply("mean", da, main_only=True)
        assert out2.dims == ("member", "month")

    def test_mbcn_rejects_add_dims(self, random):
        """Parity: the reference MBCn raises on add_dims (adjustment.py:1853)."""
        from xsdba_tpu.models import MBCn
        from xsdba_tpu.processing import stack_variables

        T = 365
        t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
        mk = lambda: DataArray(
            random.normal(0, 1, (2, T)),
            ("multivar", "time"),
            {"time": t, "multivar": np.array(["tas", "pr"])},
            {"units": ""},
            "data",
        )
        with pytest.raises(NotImplementedError, match="add_dims"):
            MBCn.train(mk(), mk(), base_kws={"group": Grouper("time", add_dims=["x"])})
