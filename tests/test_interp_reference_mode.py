"""Exact-parity mode for grouped quantile lookups (VERDICT r3 #2).

``mode="reference"`` must reproduce the reference's 2-D scipy-griddata
pipeline (utils.py:380-400 + nbutils.py:397-416) through the public API at
<= 1e-6 — the oracle below re-implements that pipeline directly from scipy,
independent of xsdba_tpu.ops.interp.
"""

import numpy as np
import pytest
from scipy.interpolate import griddata

import xsdba_tpu as xt
from xsdba_tpu import DataArray, Grouper, date_range
from xsdba_tpu.processing import interp_on_quantiles


def reference_pipeline_oracle(v, frac, xq, yq, positions, method="linear", extrap="constant"):
    """The reference grouped lookup, straight from scipy: cyclic pad, drop
    NaN nodes, griddata, then the constant/nan extrapolation overwrite."""
    pos_p = np.concatenate([[2 * positions[0] - positions[1]], positions, [2 * positions[-1] - positions[-2]]])
    xq_p = np.concatenate([xq[-1:], xq, xq[:1]], axis=0)
    yq_p = np.concatenate([yq[-1:], yq, yq[:1]], axis=0)
    pts_g = np.repeat(pos_p, xq.shape[1])
    mask_old = np.isnan(xq_p.ravel()) | np.isnan(yq_p.ravel())
    out = griddata(
        (xq_p.ravel()[~mask_old], pts_g[~mask_old]),
        yq_p.ravel()[~mask_old],
        (v, frac),
        method=method,
    )
    if method == "nearest" or extrap != "nan":
        blo = np.interp(frac, pos_p, xq_p[:, 0])
        bhi = np.interp(frac, pos_p, xq_p[:, -1])
        toolow, toohigh = v < blo, v > bhi
        if extrap == "constant":
            out[toolow] = np.interp(frac, pos_p, yq_p[:, 0])[toolow]
            out[toohigh] = np.interp(frac, pos_p, yq_p[:, -1])[toohigh]
        else:
            out[toolow] = np.nan
            out[toohigh] = np.nan
    return out


def _mk(v, t, units="K"):
    return DataArray(v, ("time",), {"time": t}, {"units": units}, "tas")


@pytest.fixture()
def daily_decade():
    t = date_range("1991-01-01", periods=3650, freq="D", calendar="noleap")
    rng = np.random.default_rng(42)
    season = 4 * np.sin(2 * np.pi * np.arange(3650) / 365.0)
    ref = _mk(10 + season + rng.normal(0, 2, 3650), t)
    hist = _mk(12 + 1.2 * season + rng.normal(0, 2.5, 3650), t)
    return t, ref, hist


def test_eqm_monthly_reference_mode_matches_scipy_oracle(daily_decade):
    t, ref, hist = daily_decade
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time.month", nquantiles=25)
    scen = eqm.adjust(hist, interp="linear", mode="reference")

    gi = Grouper("time.month").indexes(t)
    hist_q = np.asarray(eqm.ds["hist_q"].data, np.float64)
    af = np.asarray(eqm.ds["af"].data, np.float64)
    v = np.asarray(hist.data, np.float64)
    af_t = reference_pipeline_oracle(v, gi.frac_idx, hist_q, af, gi.positions)
    want = v + af_t
    got = np.asarray(scen.data, np.float64)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
    # and the blend path genuinely differs somewhere (same support, different
    # boundary interpolant) — otherwise this test proves nothing
    blend = np.asarray(eqm.adjust(hist, interp="linear").data, np.float64)
    assert np.nanmax(np.abs(blend - want)) > 1e-8


def test_qdm_monthly_reference_mode_matches_scipy_oracle(daily_decade):
    t, ref, hist = daily_decade
    qdm = xt.QuantileDeltaMapping.train(ref, hist, group="time.month", nquantiles=25, kind="+")
    with xt.set_options(extra_output=True):
        out = qdm.adjust(hist, interp="linear", mode="reference")
    scen, sim_q = out["scen"], out["sim_q"]

    gi = Grouper("time.month").indexes(t)
    q = np.asarray(qdm.ds["af"].coords["quantiles"], np.float64)
    af = np.asarray(qdm.ds["af"].data, np.float64)
    xq = np.broadcast_to(q, (len(gi.positions), q.size))
    af_t = reference_pipeline_oracle(
        np.asarray(sim_q.data, np.float64), gi.frac_idx, np.asarray(xq), af, gi.positions
    )
    want = np.asarray(hist.data, np.float64) + af_t
    np.testing.assert_allclose(np.asarray(scen.data, np.float64), want, atol=1e-6, rtol=0)


def test_public_interp_on_quantiles_reference_mode(daily_decade):
    t, ref, hist = daily_decade
    G, nq = 12, 15
    rng = np.random.default_rng(3)
    pos = np.arange(1.0, G + 1)
    xq_np = np.sort(rng.normal(10, 3, (G, nq)), axis=-1)
    yq_np = np.sort(rng.normal(11, 3, (G, nq)), axis=-1)
    xq = DataArray(xq_np, ("month", "quantiles"), {"month": pos, "quantiles": np.linspace(0.01, 0.99, nq)}, {}, "xq")
    yq = DataArray(yq_np, ("month", "quantiles"), {"month": pos, "quantiles": np.linspace(0.01, 0.99, nq)}, {}, "yq")
    gi = Grouper("time.month").indexes(t)
    for method in ("linear", "nearest"):
        got = interp_on_quantiles(hist, xq, yq, group="time.month", method=method, mode="reference")
        newg = gi.frac_idx if method != "nearest" else gi.positions[gi.group_idx]
        want = reference_pipeline_oracle(np.asarray(hist.data, np.float64), newg, xq_np, yq_np, pos, method=method)
        np.testing.assert_allclose(np.asarray(got.data, np.float64), want, atol=1e-6, rtol=0)
    with pytest.raises(ValueError, match="mode"):
        interp_on_quantiles(hist, xq, yq, group="time.month", mode="nope")


def test_dqm_reference_mode_runs(daily_decade):
    t, ref, hist = daily_decade
    dqm = xt.DetrendedQuantileMapping.train(ref, hist, group="time.month", nquantiles=20)
    a = np.asarray(dqm.adjust(hist, interp="linear", detrend=1, mode="reference").data)
    b = np.asarray(dqm.adjust(hist, interp="linear", detrend=1).data)
    assert np.isfinite(a).all()
    # boundary interpolants differ; bulk agrees
    assert np.nanmedian(np.abs(a - b)) < 0.05
    assert np.nanmax(np.abs(a - b)) > 0


# --- round-5 extensions (VERDICT r4 #7): seasons, doy+window, cubic --------


def _oracle_af(eqm, hist, group, window=1, method="linear"):
    """Scipy oracle for an EQM reference-mode adjust on any grouping."""
    t = hist.coords["time"]
    gi = (Grouper(group, window=window) if window > 1 else Grouper(group)).indexes(t)
    hist_q = np.asarray(eqm.ds["hist_q"].data, np.float64)
    af = np.asarray(eqm.ds["af"].data, np.float64)
    v = np.asarray(hist.data, np.float64)
    newg = gi.frac_idx if method != "nearest" else gi.positions[gi.group_idx]
    af_t = reference_pipeline_oracle(
        v, newg, hist_q, af, gi.positions.astype(np.float64), method=method
    )
    return v + af_t


@pytest.mark.parametrize("method", ["linear", "nearest", "cubic"])
def test_eqm_season_reference_mode_matches_scipy_oracle(daily_decade, method):
    """Seasons: the 4-group config whose blend path shows the largest
    boundary deviation (~0.5 AF scale) — reference mode must still match the
    scipy pipeline exactly (utils.py:403-405,483-490 season-int mapping)."""
    t, ref, hist = daily_decade
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time.season", nquantiles=20)
    scen = eqm.adjust(hist, interp=method, mode="reference")
    want = _oracle_af(eqm, hist, "time.season", method=method)
    got = np.asarray(scen.data, np.float64)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


@pytest.mark.parametrize("method", ["linear", "nearest", "cubic"])
def test_eqm_doy_window_reference_mode_matches_scipy_oracle(method):
    """dayofyear + 31-day window (the production heavy grouping) through the
    public API vs the scipy oracle (utils.py:380-400)."""
    periods = 365 * 4
    t = date_range("1991-01-01", periods=periods, freq="D", calendar="noleap")
    rng = np.random.default_rng(9)
    season = 4 * np.sin(2 * np.pi * np.arange(periods) / 365.0)
    mk = lambda v: DataArray(v, ("time",), {"time": t}, {"units": "K"}, "tas")
    ref = mk(10 + season + rng.normal(0, 2, periods))
    hist = mk(12 + 1.2 * season + rng.normal(0, 2.5, periods))
    eqm = xt.EmpiricalQuantileMapping.train(
        ref, hist, group="time.dayofyear", window=31, nquantiles=15
    )
    scen = eqm.adjust(hist, interp=method, mode="reference")
    want = _oracle_af(eqm, hist, "time.dayofyear", window=31, method=method)
    got = np.asarray(scen.data, np.float64)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_public_interp_on_quantiles_reference_mode_cubic(daily_decade):
    """Cubic through the public processing.interp_on_quantiles reference mode
    vs the scipy CloughTocher pipeline (griddata method='cubic')."""
    t, ref, hist = daily_decade
    G, nq = 12, 15
    rng = np.random.default_rng(4)
    pos = np.arange(1.0, G + 1)
    xq_np = np.sort(rng.normal(10, 3, (G, nq)), axis=-1)
    yq_np = np.sort(rng.normal(11, 3, (G, nq)), axis=-1)
    qc = np.linspace(0.01, 0.99, nq)
    xq = DataArray(xq_np, ("month", "quantiles"), {"month": pos, "quantiles": qc}, {}, "xq")
    yq = DataArray(yq_np, ("month", "quantiles"), {"month": pos, "quantiles": qc}, {}, "yq")
    gi = Grouper("time.month").indexes(t)
    got = interp_on_quantiles(hist, xq, yq, group="time.month", method="cubic", mode="reference")
    want = reference_pipeline_oracle(
        np.asarray(hist.data, np.float64), gi.frac_idx, xq_np, yq_np, pos, method="cubic"
    )
    np.testing.assert_allclose(np.asarray(got.data, np.float64), want, atol=1e-6, rtol=0)
