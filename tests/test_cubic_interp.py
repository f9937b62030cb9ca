"""Device-path ``interp='cubic'`` (VERDICT r4 #2).

The reference documents ``interp: {'nearest','linear','cubic'}`` for
EQM/DQM/QDM (``adjustment.py:441,558``) and implements ungrouped cubic via
``scipy.interpolate.interp1d(kind='cubic')`` (``utils.py:350-377``) — a
not-a-knot cubic spline on the NaN-compacted table with constant/NaN fill
outside the span.  The device implementation (``ops/interp.py``:
``_cubic_slopes`` + Hermite segment evaluation) must match scipy <= 1e-6 in
f64; the grouped device form is cubic-within-group + the existing cyclic
fractional blend (same structure as linear; the exact-griddata parity path
is ``mode="reference"``, tested in test_interp_reference_mode.py).
"""

import numpy as np
import pytest
from scipy.interpolate import interp1d

import xsdba_tpu as xt
from xsdba_tpu import DataArray, Grouper, date_range
from xsdba_tpu.ops.interp import interp1d_table


def _scipy_cubic(v, xq, yq, extrap="constant"):
    mask_old = np.isnan(xq) | np.isnan(yq)
    xs, ys = xq[~mask_old], yq[~mask_old]
    fv = (ys[0], ys[-1]) if extrap == "constant" else np.nan
    out = np.full_like(v, np.nan, dtype=np.float64)
    mask_new = np.isnan(v)
    out[~mask_new] = interp1d(
        xs, ys, kind="cubic", bounds_error=False, fill_value=fv
    )(v[~mask_new])
    return out


@pytest.mark.parametrize("extrap", ["constant", "nan"])
@pytest.mark.parametrize("nq", [4, 8, 50, 100])  # 100 > unroll max: gathered form
def test_interp1d_table_cubic_matches_scipy(nq, extrap):
    rng = np.random.default_rng(nq)
    xq = np.sort(rng.normal(0, 5, nq))
    yq = rng.normal(10, 3, nq)
    v = rng.normal(0, 6.5, 400)  # in- and out-of-range points
    v[::37] = np.nan
    got = np.asarray(interp1d_table(v, xq, yq, "cubic", extrap))
    want = _scipy_cubic(v, xq, yq, extrap)
    np.testing.assert_allclose(got, want, atol=1e-9, rtol=0)


def test_cubic_nan_pair_compaction_matches_scipy():
    """NaN (x, y) pairs are dropped before the spline solve, exactly as the
    reference passes the masked table to scipy (utils.py:351)."""
    rng = np.random.default_rng(5)
    xq = np.sort(rng.normal(0, 5, 24))
    yq = rng.normal(0, 3, 24)
    xq[[3, 11]] = np.nan
    yq[17] = np.nan
    v = rng.normal(0, 6, 300)
    got = np.asarray(interp1d_table(v, xq, yq, "cubic", "constant"))
    np.testing.assert_allclose(got, _scipy_cubic(v, xq, yq), atol=1e-9, rtol=0)


def test_cubic_batched_tables_variable_nvalid():
    rng = np.random.default_rng(6)
    B, nq = 6, 30
    xq = np.sort(rng.normal(0, 5, (B, nq)), axis=-1)
    yq = rng.normal(0, 3, (B, nq))
    xq[1, 5:9] = np.nan  # row with dropped pairs
    yq[2, -3:] = np.nan
    v = rng.normal(0, 6, (B, 200))
    got = np.asarray(interp1d_table(v, xq, yq, "cubic", "nan"))
    for i in range(B):
        np.testing.assert_allclose(
            got[i], _scipy_cubic(v[i], xq[i], yq[i], "nan"), atol=1e-9, rtol=0,
            err_msg=f"row {i}",
        )


def test_cubic_degenerate_rows_fall_back_to_linear():
    """scipy raises below 4 nodes (make_interp_spline k=3); the device path
    degrades those rows to linear — a documented deviation."""
    xq = np.array([0.0, 1.0, 2.0, np.nan, np.nan])
    yq = np.array([0.0, 3.0, 1.0, np.nan, np.nan])
    v = np.array([-0.5, 0.25, 0.5, 1.5, 2.5])
    got = np.asarray(interp1d_table(v, xq, yq, "cubic", "constant"))
    lin = np.asarray(interp1d_table(v, xq, yq, "linear", "constant"))
    np.testing.assert_array_equal(got, lin)


def _series(periods=3650, seed=42):
    t = date_range("1991-01-01", periods=periods, freq="D", calendar="noleap")
    rng = np.random.default_rng(seed)
    season = 4 * np.sin(2 * np.pi * np.arange(periods) / 365.0)
    mk = lambda v: DataArray(v, ("time",), {"time": t}, {"units": "K"}, "tas")
    ref = mk(10 + season + rng.normal(0, 2, periods))
    hist = mk(12 + 1.2 * season + rng.normal(0, 2.5, periods))
    return t, ref, hist


def test_eqm_adjust_cubic_ungrouped_matches_scipy():
    """EQM.adjust(interp='cubic') at group='time': the af lookup is exactly
    scipy interp1d(kind='cubic') on the (hist_q -> af) table."""
    t, ref, hist = _series()
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time", nquantiles=30)
    scen = eqm.adjust(hist, interp="cubic")
    hq = np.asarray(eqm.ds["hist_q"].data, np.float64)[0]
    af = np.asarray(eqm.ds["af"].data, np.float64)[0]
    v = np.asarray(hist.data, np.float64)
    want = v + _scipy_cubic(v, hq, af)
    np.testing.assert_allclose(np.asarray(scen.data, np.float64), want, atol=1e-6, rtol=0)
    # differs from linear somewhere (otherwise this proves nothing)
    lin = np.asarray(eqm.adjust(hist, interp="linear").data, np.float64)
    assert np.nanmax(np.abs(lin - want)) > 1e-8


def test_eqm_adjust_cubic_grouped_blend_matches_per_group_scipy():
    """Grouped cubic on the device path = cubic within each bracketing
    (cyclically padded) group's table + the fractional-index linear blend —
    the same structure the linear path pins, with scipy as the per-group
    1-D oracle."""
    t, ref, hist = _series()
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time.month", nquantiles=25)
    scen = eqm.adjust(hist, interp="cubic")

    gi = Grouper("time.month").indexes(t)
    hq = np.asarray(eqm.ds["hist_q"].data, np.float64)
    af = np.asarray(eqm.ds["af"].data, np.float64)
    pos = gi.positions.astype(np.float64)
    pos_p = np.concatenate([[pos[0] - (pos[1] - pos[0])], pos, [pos[-1] + (pos[-1] - pos[-2])]])
    hq_p = np.concatenate([hq[-1:], hq, hq[:1]], axis=0)
    af_p = np.concatenate([af[-1:], af, af[:1]], axis=0)
    Gp = len(pos_p)
    frac = gi.frac_idx
    g1 = np.clip(np.searchsorted(pos_p, frac, side="right"), 1, Gp - 1)
    g0 = g1 - 1
    w = (frac - pos_p[g0]) / (pos_p[g1] - pos_p[g0])
    v = np.asarray(hist.data, np.float64)
    tabs = [_scipy_cubic(v, hq_p[g], af_p[g]) for g in range(Gp)]
    tabs = np.stack(tabs)
    af_t = (1 - w) * tabs[g0, np.arange(len(v))] + w * tabs[g1, np.arange(len(v))]
    want = v + af_t
    np.testing.assert_allclose(np.asarray(scen.data, np.float64), want, atol=1e-6, rtol=0)


def test_qdm_dqm_cubic_run_and_differ_from_linear():
    t, ref, hist = _series()
    qdm = xt.QuantileDeltaMapping.train(ref, hist, group="time.month", nquantiles=25)
    a = np.asarray(qdm.adjust(hist, interp="cubic").data)
    b = np.asarray(qdm.adjust(hist, interp="linear").data)
    assert np.isfinite(a).all()
    assert np.nanmax(np.abs(a - b)) > 1e-8
    dqm = xt.DetrendedQuantileMapping.train(ref, hist, group="time.month", nquantiles=20)
    c = np.asarray(dqm.adjust(hist, interp="cubic", detrend=1).data)
    assert np.isfinite(c).all()


def test_eqm_cubic_windowed_doy():
    """Cubic through the windowed dayofyear production grouping (integer
    fractional indexes -> collapsed brackets, cubic within the single
    bracketing group)."""
    t, ref, hist = _series(periods=365 * 6)
    eqm = xt.EmpiricalQuantileMapping.train(
        ref, hist, group="time.dayofyear", window=31, nquantiles=20
    )
    scen = eqm.adjust(hist, interp="cubic")
    v = np.asarray(hist.data, np.float64)
    got = np.asarray(scen.data, np.float64)
    assert np.isfinite(got).all()
    # doy brackets collapse (integer frac index): each timestep is exactly
    # scipy cubic on its own day's table
    gi = Grouper("time.dayofyear", window=31).indexes(t)
    hq = np.asarray(eqm.ds["hist_q"].data, np.float64)
    af = np.asarray(eqm.ds["af"].data, np.float64)
    g = gi.group_idx
    for d in [0, 100, 250, 364]:
        sel = g == d
        want = v[sel] + _scipy_cubic(v[sel], hq[d], af[d])
        np.testing.assert_allclose(got[sel], want, atol=1e-6, rtol=0, err_msg=f"doy {d}")
