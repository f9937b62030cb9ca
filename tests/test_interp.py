import numpy as np
import pytest
from scipy.interpolate import interp1d

from xsdba_tpu.ops.correction import broadcast_group_factors, ecdf, equally_spaced_nodes, map_cdf
from xsdba_tpu.ops.interp import interp1d_table, interp_on_quantiles_grouped
from xsdba_tpu.ops.segment import grouped_mean, grouped_rank
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper


@pytest.mark.parametrize("extrap", ["constant", "nan"])
def test_interp1d_matches_scipy(random, extrap):
    xq = np.sort(random.normal(size=30))
    yq = random.normal(size=30)
    v = random.normal(size=200) * 2
    if extrap == "constant":
        fill = (yq[0], yq[-1])
    else:
        fill = np.nan
    want = interp1d(xq, yq, bounds_error=False, fill_value=fill)(v)
    got = np.asarray(interp1d_table(v, xq, yq, "linear", extrap))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_interp1d_nan_pairs(random):
    xq = np.sort(random.normal(size=20))
    yq = random.normal(size=20)
    xq[3] = np.nan
    yq[7] = np.nan
    mask = np.isnan(xq) | np.isnan(yq)
    v = random.normal(size=100)
    want = interp1d(
        xq[~mask], yq[~mask], bounds_error=False, fill_value=(yq[~mask][0], yq[~mask][-1])
    )(v)
    got = np.asarray(interp1d_table(v, xq, yq, "linear", "constant"))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_interp1d_nan_input(random):
    xq = np.sort(random.normal(size=10))
    yq = random.normal(size=10)
    v = np.array([0.0, np.nan])
    got = np.asarray(interp1d_table(v, xq, yq, "linear", "constant"))
    assert np.isnan(got[1]) and np.isfinite(got[0])


def test_interp1d_batched(random):
    xq = np.sort(random.normal(size=(4, 25)), axis=-1)
    yq = random.normal(size=(4, 25))
    v = random.normal(size=(4, 50))
    got = np.asarray(interp1d_table(v, xq, yq, "linear", "constant"))
    for i in range(4):
        want = interp1d(xq[i], yq[i], bounds_error=False, fill_value=(yq[i, 0], yq[i, -1]))(v[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-12)


def test_grouped_interp_uniform_groups(random):
    """When all group tables are identical, grouped interp == 1D interp."""
    G, nq, T = 12, 20, 300
    xq1 = np.sort(random.normal(size=nq))
    yq1 = random.normal(size=nq)
    xq = np.tile(xq1, (G, 1))
    yq = np.tile(yq1, (G, 1))
    v = random.normal(size=T)
    frac = random.uniform(0.5, 12.5, size=T)
    got = np.asarray(
        interp_on_quantiles_grouped(v, frac, xq, yq, np.arange(1, 13), "linear", "constant")
    )
    want = interp1d(xq1, yq1, bounds_error=False, fill_value=(yq1[0], yq1[-1]))(v)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_grouped_interp_blends_cyclically(random):
    """Offset tables: value halfway between groups gets the mean correction."""
    G, nq = 4, 10
    xq = np.tile(np.linspace(0, 1, nq), (G, 1))
    yq = np.stack([np.full(nq, float(g)) for g in range(G)])
    pos = np.arange(1.0, G + 1)
    v = np.full(5, 0.5)
    # exactly on group 2's position -> 1.0; halfway between 2 and 3 -> 1.5
    got_on = np.asarray(interp_on_quantiles_grouped(v, np.full(5, 2.0), xq, yq, pos))
    got_mid = np.asarray(interp_on_quantiles_grouped(v, np.full(5, 2.5), xq, yq, pos))
    np.testing.assert_allclose(got_on, 1.0, atol=1e-12)
    np.testing.assert_allclose(got_mid, 1.5, atol=1e-12)
    # cyclic: frac below first group blends with the last group
    got_wrap = np.asarray(interp_on_quantiles_grouped(v, np.full(5, 0.5), xq, yq, pos))
    np.testing.assert_allclose(got_wrap, (0.0 + 3.0) / 2, atol=1e-12)


def test_ecdf_map_cdf(random):
    x = random.normal(size=500)
    assert float(ecdf(x, np.quantile(x, 0.3))) == pytest.approx(0.3, abs=0.01)
    y = random.normal(size=500) * 2 + 5
    v = map_cdf(x, y, np.array(5.0))
    assert float(v) == pytest.approx(np.quantile(x, (y <= 5).mean()), abs=1e-6)


def test_equally_spaced_nodes():
    q = equally_spaced_nodes(4)
    np.testing.assert_allclose(q, [0.125, 0.375, 0.625, 0.875])
    q2 = equally_spaced_nodes(4, eps=1e-6)
    assert q2[0] == 1e-6 and q2[-1] == 1 - 1e-6 and len(q2) == 6


def test_broadcast_nearest_linear():
    f = np.arange(12.0)
    t = date_range("2000-01-01", periods=366, freq="D")
    g = Grouper("time.month")
    gi = g.indexes(t)
    out = np.asarray(broadcast_group_factors(f, gi.frac_idx, gi.group_idx, np.arange(1, 13), "nearest"))
    np.testing.assert_array_equal(out, t.month - 1)
    lin = np.asarray(broadcast_group_factors(f, gi.frac_idx, gi.group_idx, np.arange(1, 13), "linear"))
    # parity with np.interp on the cyclically padded axis (what xarray
    # .interp does after add_cyclic_bounds, reference utils.py:222-232)
    want = np.interp(gi.frac_idx, np.arange(0, 14), np.r_[11.0, f, 0.0])
    np.testing.assert_allclose(lin, want, rtol=1e-12)
    # early January blends with December (cyclic)
    assert lin[0] > 5.0


def test_grouped_mean_and_rank(random):
    t = date_range("2000-01-01", periods=731, freq="D")
    gi = Grouper("time.month").indexes(t)
    x = random.normal(size=(3, 731))
    m = np.asarray(grouped_mean(x, gi.gather_idx))
    assert m.shape == (3, 12)
    want0 = x[:, t.month == 1].mean(axis=-1)
    np.testing.assert_allclose(m[:, 0], want0, rtol=1e-12)

    r = np.asarray(grouped_rank(x, gi.gather_idx, gi.group_idx, gi.scatter_slot, pct=True))
    assert r.shape == x.shape
    # within each month, pct ranks span exactly [0, 1]
    jan = r[:, t.month == 1]
    assert jan.min() == pytest.approx(0.0) and jan.max() == pytest.approx(1.0)
    order = np.argsort(x[0, t.month == 1])
    assert np.all(np.diff(jan[0][order]) > 0)


def test_gathered_matches_unrolled_large_tables(random):
    """Above _UNROLL_MAX_NQ the binary-search+gather form takes over; its
    semantics must match the unrolled form exactly."""
    import jax.numpy as jnp

    from xsdba_tpu.ops.interp import (
        _compact_nan_pairs,
        _interp_gathered,
        _interp_unrolled,
    )

    nq, T, R = 40, 300, 4
    xs = np.sort(random.normal(size=(R, nq)), axis=-1)
    ys = random.normal(size=(R, nq))
    xs[0, 5] = np.nan
    ys[1, 2] = np.nan
    v = random.normal(size=(R, T)) * 2
    v[2, 7] = np.nan
    xsc, ysc, nv = _compact_nan_pairs(jnp.asarray(xs), jnp.asarray(ys))
    for method in ("linear", "nearest"):
        for extrap in ("constant", "nan"):
            a = np.asarray(_interp_unrolled(jnp.asarray(v), xsc, ysc, nv, method, extrap))
            b = np.asarray(_interp_gathered(jnp.asarray(v), xsc, ysc, nv, method, extrap))
            np.testing.assert_array_equal(a, b)


def test_public_interp_on_quantiles_constant_nan(random):
    """Mirror of reference tests/test_utils.py:70-113: lat-batched tables,
    NaNs in newx, constant/nan extrapolation, and NaN table pairs."""
    import jax.numpy as jnp

    from xsdba_tpu import DataArray, date_range, interp_on_quantiles

    quantiles = np.linspace(0, 1, num=25)
    xq1 = np.linspace(205, 229, num=25)
    yq1 = np.linspace(2, 4.4, num=25)
    t = date_range("1900-03-01", periods=41, freq="D", calendar="standard")
    newx_v = np.linspace(240, 200, num=41) - 0.5
    newx_v = np.where(newx_v > 201, newx_v, np.nan)

    lat = np.array([1, 2, 3])
    mk = lambda v, dims, coords: DataArray(v, dims, coords, {}, "x")
    xq = mk(np.broadcast_to(xq1, (3, 25)).copy(), ("lat", "quantiles"), {"lat": lat, "quantiles": quantiles})
    yq = mk(np.broadcast_to(yq1, (3, 25)).copy(), ("lat", "quantiles"), {"lat": lat, "quantiles": quantiles})
    newx = mk(np.broadcast_to(newx_v, (3, 41)).copy(), ("lat", "time"), {"lat": lat, "time": t})

    for interp, expi in [("nearest", 2.9), ("linear", 2.95)]:
        for extrap, expe in [("constant", 4.4), ("nan", np.nan)]:
            out = np.asarray(interp_on_quantiles(newx, xq, yq, group="time", method=interp, extrapolation=extrap).data)
            # first time = 239.5, above the table: constant -> last y, nan -> NaN
            if np.isnan(expe):
                assert np.isnan(out[:, 0]).all()
            else:
                np.testing.assert_allclose(out[1, 0], expe)
            np.testing.assert_allclose(out[:, 25], expi, rtol=1e-6)
            assert np.isnan(out[:, -1]).all()  # NaN input stays NaN

            # NaN pair in the table is skipped, result unchanged elsewhere
            xq2 = xq.copy(); yq2 = yq.copy()
            d2 = np.asarray(xq2.data); d2[d2 == 220] = np.nan
            e2 = np.asarray(yq2.data); e2[e2 == 3] = np.nan
            out2 = np.asarray(interp_on_quantiles(newx, mk(d2, xq.dims, dict(xq.coords)), mk(e2, yq.dims, dict(yq.coords)), group="time", method=interp, extrapolation=extrap).data)
            np.testing.assert_allclose(out2[:, 25], expi, rtol=1e-6)


def test_public_interp_on_quantiles_monthly_no_nans(random):
    """Mirror of reference tests/test_utils.py:116-148: grouped monthly
    interpolation of correction factors never produces NaN."""
    from xsdba_tpu import DataArray, date_range, interp_on_quantiles
    from xsdba_tpu.ops.correction import equally_spaced_nodes, get_correction
    from xsdba_tpu.ops.quantile import grouped_nan_quantile
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2000-01-01", periods=365 * 31, freq="D", calendar="noleap")
    doy = np.asarray(t.dayofyear)
    days = np.arange(t.size)
    ref_v = -20 * np.cos(2 * np.pi * doy / 365) + 2 * random.random(t.size) + 273.15 + 0.1 * days / 365
    sim_v = -18 * np.cos(2 * np.pi * doy / 365) + 2 * random.random(t.size) + 273.15 + 0.11 * days / 365

    n_hist = 365 * 15
    gi = Grouper("time.month").indexes(t)
    import jax.numpy as jnp

    gih = Grouper("time.month").indexes(date_range("2000-01-01", periods=n_hist, freq="D", calendar="noleap"))
    q = equally_spaced_nodes(15)
    ref_q = grouped_nan_quantile(jnp.asarray(ref_v[:n_hist]), gih.gather_idx, jnp.asarray(q))
    hist_q = grouped_nan_quantile(jnp.asarray(sim_v[:n_hist]), gih.gather_idx, jnp.asarray(q))
    af = get_correction(hist_q, ref_q, "+")

    mkq = lambda v: DataArray(np.asarray(v), ("month", "quantiles"), {"month": np.arange(1, 13), "quantiles": q}, {}, "q")
    sim = DataArray(sim_v, ("time",), {"time": t}, {"units": "K"}, "sim")
    for interp in ("nearest", "linear"):
        afi = interp_on_quantiles(sim, mkq(hist_q), mkq(af), group="time.month", method=interp, extrapolation="constant")
        assert np.isnan(np.asarray(afi.data)).sum() == 0, interp


def test_single_valid_pair_exact_match():
    """A table with ONE valid pair must return its y at v == x (the NaN pad
    neighbour used to poison the 0-weighted blend)."""
    import jax.numpy as jnp

    from xsdba_tpu.ops.interp import interp1d_table

    xq = jnp.array([2.0, jnp.nan, jnp.nan, jnp.nan])
    yq = jnp.array([7.0, jnp.nan, jnp.nan, jnp.nan])
    for nq_pad in (0, 100):  # small table (unrolled) and large (gathered)
        xqp = jnp.concatenate([xq, jnp.full(nq_pad, jnp.nan)])
        yqp = jnp.concatenate([yq, jnp.full(nq_pad, jnp.nan)])
        v = jnp.array([2.0, 1.0, 3.0])
        out = np.asarray(interp1d_table(v, xqp, yqp, "linear", "constant"))
        np.testing.assert_allclose(out, [7.0, 7.0, 7.0])


def test_tables_compact_fast_path_bit_identical():
    """``tables_compact=True`` (quantile-trained tables: ascending, NaN rows
    whole) must be bit-identical to the argsort compaction it skips,
    including all-NaN (empty-group) rows — the fast path removes a per-step
    sort + small-axis gathers from the fused adjust programs."""
    import jax.numpy as jnp
    import numpy as np

    from xsdba_tpu import Grouper, date_range
    from xsdba_tpu.models._wrap import device_brackets
    from xsdba_tpu.ops.interp import interp_grouped_partitioned

    t = date_range("2001-01-01", periods=365 * 4, freq="D", calendar="noleap")
    gi = Grouper("time.month").indexes(t)
    br = device_brackets(gi, "linear")
    rng = np.random.default_rng(13)
    B, G, nq = 5, 12, 17
    xq = np.sort(rng.normal(10, 3, (B, G, nq)), axis=-1).astype(np.float32)
    yq = rng.normal(0, 1, (B, G, nq)).astype(np.float32)
    xq[1, 4] = np.nan  # empty group: whole row NaN on both sides
    yq[1, 4] = np.nan
    v = rng.normal(10, 4, (B, len(t))).astype(np.float32)
    part0, g0, slot0, part1, g1, slot1, w = br
    args = (jnp.asarray(v), jnp.asarray(xq), jnp.asarray(yq), part0, g0, slot0, part1, g1, slot1, w)
    kw = dict(regular0=getattr(br, "regular0", None))
    for method in ("linear", "nearest", "cubic"):
        a = np.asarray(interp_grouped_partitioned(*args, method, "constant", tables_compact=False, **kw))
        b = np.asarray(interp_grouped_partitioned(*args, method, "constant", tables_compact=True, **kw))
        np.testing.assert_array_equal(a, b, err_msg=method)
