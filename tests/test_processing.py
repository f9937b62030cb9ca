"""Public processing API tests (reference tests/test_processing.py analogues)."""

import numpy as np
import pytest

import xsdba_tpu as xt
from xsdba_tpu.processing import (
    adapt_freq,
    jitter_over_thresh,
    jitter_under_thresh,
    normalize,
    reordering,
    standardize,
    uniform_noise_like,
    unstandardize,
)


def series(values, units="K", calendar="noleap", name="tas"):
    t = xt.date_range("2000-01-01", periods=np.shape(values)[-1], freq="D", calendar=calendar)
    dims = ("time",) if np.ndim(values) == 1 else ("site", "time")
    return xt.DataArray(np.asarray(values, dtype=np.float64), dims, {"time": t}, {"units": units}, name)


def test_jitter_under(random):
    x = random.gamma(1, 1, 2000)
    x[x < 0.5] = 0.0
    da = series(x, units="mm/d", name="pr")
    out = np.asarray(jitter_under_thresh(da, "0.5 mm/d").data)
    assert (out > 0).all() and (out[x < 0.5] < 0.5).all()
    np.testing.assert_array_equal(out[x >= 0.5], x[x >= 0.5])


def test_jitter_over(random):
    x = random.gamma(2, 2, 2000)
    da = series(x, units="mm/d", name="pr")
    out = np.asarray(jitter_over_thresh(da, "10 mm/d", "15 mm/d").data)
    assert out.max() <= 15
    np.testing.assert_array_equal(out[x <= 10], x[x <= 10])


def test_adapt_freq_public(random):
    n = 5000
    u = random.random(n)
    ref_v = np.where(u < 0.3, 0.0, random.gamma(2, 2, n))
    sim_v = np.where(u < 0.6, 0.0, random.gamma(2, 2, n))
    out = adapt_freq(series(ref_v, "mm/d", name="pr"), series(sim_v, "mm/d", name="pr"), thresh="0.1 mm/d")
    assert set(out.keys()) == {"sim_ad", "pth", "dP0", "P0_ref", "P0_hist"}
    sa = np.asarray(out["sim_ad"].data)
    assert (sa < 0.1).mean() == pytest.approx((ref_v < 0.1).mean(), abs=0.02)
    assert float(np.asarray(out["dP0"].data).ravel()[0]) == pytest.approx(0.5, abs=0.05)


def test_normalize_roundtripish(random):
    n = 365 * 3
    t = xt.date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
    x = 10 + 5 * np.sin(2 * np.pi * np.arange(n) / 365) + random.normal(0, 0.5, n)
    da = series(x)
    anom, norm = normalize(da, group="time.month")
    assert norm.shape[-1] == 12
    a = np.asarray(anom.data)
    assert abs(a.mean()) < 0.05
    # kind="*"
    da2 = series(x + 20, units="mm/d", name="pr")
    anom2, norm2 = normalize(da2, group="time.month", kind="*")
    m = np.asarray(anom2.data)
    assert m.mean() == pytest.approx(1.0, abs=0.01)


def test_standardize_roundtrip(random):
    x = random.normal(5, 3, (2, 500))
    da = series(x)
    std, mu, sig = standardize(da)
    sv = np.asarray(std.data)
    np.testing.assert_allclose(sv.mean(axis=-1), 0, atol=1e-9)
    np.testing.assert_allclose(sv.std(axis=-1), 1, rtol=1e-9)
    back = unstandardize(std, mu, sig)
    np.testing.assert_allclose(np.asarray(back.data), x, rtol=1e-9)


def test_reordering(random):
    x = random.normal(size=500)
    y = random.normal(5, 2, 500)
    out = np.asarray(reordering(series(x), series(y)).data)
    # same values as y, rank order of x
    np.testing.assert_allclose(np.sort(out), np.sort(y), rtol=1e-12)
    np.testing.assert_array_equal(np.argsort(out), np.argsort(x))


def test_uniform_noise_like(random):
    da = series(np.zeros(100))
    noise = np.asarray(uniform_noise_like(da, 1e-6, 1e-3).data)
    assert noise.shape == (100,)
    assert (noise >= 1e-6).all() and (noise <= 1e-3).all()


def test_rng_reproducible():
    from xsdba_tpu.utils.rng import seed

    da = series(np.zeros(50))
    seed(123)
    a = np.asarray(uniform_noise_like(da).data)
    seed(123)
    b = np.asarray(uniform_noise_like(da).data)
    np.testing.assert_array_equal(a, b)


def test_adapt_freq_rolling_window(random):
    """Notebook scenario (advanced_example: 'Frequency adaption with a
    rolling window'): windowed doy grouping adapts the dry-day frequency."""
    from xsdba_tpu import DataArray, date_range
    from xsdba_tpu.processing import adapt_freq
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2000-01-01", periods=365 * 4, freq="D", calendar="noleap")
    pr_ref = np.where(random.random(t.size) < 0.6, 0.0, random.gamma(2, 2, t.size))
    pr_sim = np.where(random.random(t.size) < 0.8, 0.0, random.gamma(2, 2, t.size))
    mk = lambda v, n: DataArray(v, ("time",), {"time": t}, {"units": "mm/d"}, n)
    out = adapt_freq(mk(pr_ref, "ref"), mk(pr_sim, "sim"), group=Grouper("time.dayofyear", window=31), thresh="1 mm/d")
    sim_ad = np.asarray(out["sim_ad"].data)
    assert out["pth"].dims == ("dayofyear",)
    dry_ref = (pr_ref <= 1).mean()
    dry_sim = (pr_sim <= 1).mean()
    dry_ad = (sim_ad <= 1).mean()
    assert abs(dry_ad - dry_ref) < abs(dry_sim - dry_ref) * 0.25


def test_jitter_minimum_bounds_noise(random):
    """`minimum` is the lower bound of the under-threshold noise (reference
    processing.py:124-224), not machine epsilon."""
    from xsdba_tpu.processing import jitter

    x = series(np.zeros(2000), "mm/d", name="pr")
    out = np.asarray(jitter(x, lower="1 mm/d", minimum="0.5 mm/d").data)
    assert out.min() >= 0.5 and out.max() < 1.0
    assert out.std() > 0.01  # actually jittered


def test_reordering_windowed_group_matches_reference_2d(random):
    """Windowed reordering: flat reorder over the window-expanded group
    members, keep the middle-of-window column — reference ``_reordering_2d``
    (``_processing.py:205-210``), oracled here in numpy."""
    from xsdba_tpu import Grouper

    years, window = 4, 5
    T = 365 * years
    x = random.normal(size=T)
    y = random.normal(5.0, 2.0, T)
    ref, sim = series(x), series(y)
    out = np.asarray(reordering(ref, sim, group=Grouper("time.dayofyear", window=window)).data)

    gi = Grouper("time.dayofyear", window=window).indexes(ref.time)
    want = np.full(T, np.nan)
    for g in range(gi.n_groups):
        row = gi.gather_idx[g]
        rg = np.where(row < 0, np.nan, x[np.clip(row, 0, T - 1)])
        sg = np.where(row < 0, np.nan, y[np.clip(row, 0, T - 1)])
        flat = np.sort(sg)[np.argsort(np.argsort(rg))]
        centers = np.flatnonzero(gi.group_idx == g)
        # center slot of member i is i*window + window//2 (time-major rows)
        want[centers] = flat[np.arange(len(centers)) * window + window // 2]
    np.testing.assert_allclose(out, want, rtol=1e-12)
    assert np.isfinite(out).all()


def test_broadcast_sel_out_of_range_is_nan(random):
    """broadcast(..., sel=...) linear path: values beyond the coordinate
    span return NaN like xarray .interp (no silent constant extrapolation)."""
    from xsdba_tpu import DataArray, Grouper
    from xsdba_tpu.processing import broadcast

    T = 365
    t = series(np.zeros(T)).time
    q = np.linspace(0.1, 0.9, 5)
    tab = DataArray(
        np.arange(12 * 5, dtype=float).reshape(12, 5),
        ("month", "quantiles"),
        {"month": np.arange(1, 13), "quantiles": q},
        {},
        "af",
    )
    x = series(np.zeros(T))
    ranks = np.linspace(0.0, 1.0, T)  # spills below 0.1 and above 0.9
    selda = DataArray(ranks, ("time",), {"time": t}, {}, "rank")
    out = np.asarray(
        broadcast(tab, x, group="time.month", interp="linear", sel={"quantiles": selda}).data
    )
    assert np.isnan(out[ranks < q[0]]).all()
    assert np.isnan(out[ranks > q[-1]]).all()
    inside = (ranks >= q[0]) & (ranks <= q[-1])
    assert np.isfinite(out[inside]).all()


def test_interp_on_quantiles_shared_xq_with_batch_dims(random):
    """A prop-less xq carrying batch dims must still broadcast over the
    group axis (not have a batch axis misread as groups)."""
    from xsdba_tpu import DataArray, Grouper
    from xsdba_tpu.processing import interp_on_quantiles

    T, S, nq, G = 365 * 2, 3, 7, 12
    t = series(np.zeros(T)).time
    v = DataArray(
        random.normal(0.5, 0.2, (S, T)),
        ("site", "time"),
        {"time": t, "site": np.arange(S)},
        {"units": ""},
        "v",
    )
    q = np.linspace(0.05, 0.95, nq)
    xq = DataArray(
        np.broadcast_to(q, (S, nq)).copy(),
        ("site", "quantiles"),
        {"site": np.arange(S), "quantiles": q},
        {},
        "xq",
    )
    yq = DataArray(
        random.normal(0, 1, (S, G, nq)).cumsum(axis=-1),
        ("site", "month", "quantiles"),
        {"site": np.arange(S), "month": np.arange(1, 13), "quantiles": q},
        {},
        "yq",
    )
    out = interp_on_quantiles(v, xq, yq, group="time.month", method="linear")
    got = np.asarray(out.data)
    assert got.shape == (S, T)
    # oracle: shared per-site 1-D tables, bracketing-group blend
    gi = Grouper("time.month").indexes(t)
    pos = gi.positions.astype(float)
    pos_p = np.concatenate([[pos[0] - 1], pos, [pos[-1] + 1]])
    yq_np = np.asarray(yq.data)
    yq_p = np.concatenate([yq_np[:, -1:], yq_np, yq_np[:, :1]], axis=1)
    g1 = np.clip(np.searchsorted(pos_p, gi.frac_idx, side="right"), 1, len(pos_p) - 1)
    g0 = g1 - 1
    w = (gi.frac_idx - pos_p[g0]) / (pos_p[g1] - pos_p[g0])
    vv = np.asarray(v.data)
    want = np.empty_like(vv)
    for s in range(S):
        tabs = np.stack([np.interp(vv[s], q, yq_p[s, g]) for g in range(len(pos_p))])
        want[s] = (1 - w) * tabs[g0, np.arange(T)] + w * tabs[g1, np.arange(T)]
    np.testing.assert_allclose(got, want, atol=1e-9)
