import numpy as np
import pytest

from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper


def test_parse():
    g = Grouper("time.month")
    assert g.dim == "time" and g.prop == "month"
    g2 = Grouper("time", window=1)
    assert g2.prop == "group"
    with pytest.raises(ValueError):
        Grouper("time", window=5)
    g3 = Grouper("5D", window=3)
    assert g3.dim == "time" and g3.prop == "5D"


def test_month_groups():
    t = date_range("2000-01-01", periods=731, freq="D")
    gi = Grouper("time.month").indexes(t)
    assert gi.n_groups == 12
    np.testing.assert_array_equal(gi.group_idx, t.month - 1)
    # January has 31 * 2 = 62 members
    assert gi.group_counts[0] == 62
    jan = gi.gather_idx[0][gi.gather_idx[0] >= 0]
    assert np.all(t.month[jan] == 1)


def test_month_frac_index():
    t = date_range("2000-01-01", periods=60, freq="D")
    gi = Grouper("time.month").indexes(t)
    # reference base.py:296: month - 0.5 + day/days_in_month
    assert gi.frac_idx[0] == pytest.approx(1 - 0.5 + 1 / 31)
    assert gi.frac_idx[31] == pytest.approx(2 - 0.5 + 1 / 29)


def test_doy_window_membership():
    t = date_range("2001-01-01", periods=365 * 3, freq="D", calendar="noleap")
    g = Grouper("time.dayofyear", window=5)
    gi = g.indexes(t)
    assert gi.n_groups == 365
    # doy 10 (0-based 9): centers at idx 9, 374, 739; window +-2
    row = gi.gather_idx[9]
    valid = row[row >= 0]
    expect = np.concatenate([np.arange(7, 12), np.arange(372, 377), np.arange(737, 742)])
    np.testing.assert_array_equal(np.sort(valid), expect)
    # doy 1 at series start: two positions fall before the series -> padded
    row0 = gi.gather_idx[0]
    assert (row0 >= 0).sum() == 3 * 5 - 2


def test_season_index():
    t = date_range("2000-01-01", periods=366, freq="D")
    gi = Grouper("time.season").indexes(t)
    assert gi.n_groups == 4
    assert gi.group_idx[0] == 0  # Jan -> DJF
    assert gi.group_idx[200] == 2  # mid-July -> JJA
    # frac: doy/366*4 - 1/6
    assert gi.frac_idx[0] == pytest.approx(1 / 366 * 4 - 1 / 6)


def test_whole_series_group():
    t = date_range("2000-01-01", periods=100, freq="D")
    gi = Grouper("time").indexes(t)
    assert gi.n_groups == 1
    assert gi.group_counts[0] == 100
    np.testing.assert_array_equal(np.sort(gi.gather_idx[0]), np.arange(100))


def test_equality_and_hash():
    assert Grouper("time.month") == Grouper("time.month")
    assert Grouper("time") == "time"
    assert Grouper("time.month", window=3) != Grouper("time.month")
    assert hash(Grouper("time.month")) == hash(Grouper("time.month"))


def test_even_window():
    """Even windows must produce exactly `window` offsets (extra point left,
    like xarray center=True rolling)."""
    t = date_range("2001-01-01", periods=365 * 2, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=30).indexes(t)
    assert gi.gather_idx.shape[1] == 2 * 30
    row = gi.gather_idx[100]
    valid = np.sort(row[row >= 0])
    np.testing.assert_array_equal(valid, np.concatenate([np.arange(85, 115), np.arange(450, 480)]))


def test_grouper_apply(random):
    import xsdba_tpu as xt

    t = date_range("2000-01-01", periods=730, freq="D", calendar="noleap")
    x = random.normal(10, 2, 730)
    da = xt.DataArray(x, ("time",), {"time": t}, {"units": "K"}, "tas")
    m = Grouper("time.season").apply("mean", da)
    assert m.dims == ("season",)
    djf = x[np.asarray(t.season) == 0].mean()
    assert abs(float(np.asarray(m.data)[0]) - djf) < 1e-9
    # callable form
    import jax.numpy as jnp

    mx = Grouper("time.month").apply(lambda v: jnp.nanmax(v, axis=-1), da)
    assert mx.shape == (12,)


class TestApplyTransform:
    def test_non_reducing_callable_scatters_back(self):
        """A callable keeping the [..., G, L] shape is a transform whose
        result lands back on the time axis (reference base.py:438-450)."""
        import jax.numpy as jnp

        from xsdba_tpu import DataArray, date_range
        from xsdba_tpu.utils.grouper import Grouper

        rng = np.random.default_rng(3)
        T = 365 * 2
        t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
        x = rng.normal(10, 2, T)
        da = DataArray(x, ("time",), {"time": t}, {"units": "K"}, "tas")

        # group-wise centering as a non-reducing transform
        out = Grouper("time.month").apply(lambda v: v - jnp.nanmean(v, axis=-1, keepdims=True), da)
        assert out.dims == ("time",)
        got = np.asarray(out.data)
        month = np.asarray(da.time.month)
        for m in range(1, 13):
            sel = month == m
            np.testing.assert_allclose(got[sel], x[sel] - x[sel].mean(), rtol=1e-12)

    def test_windowed_transform_takes_center(self):
        import jax.numpy as jnp

        from xsdba_tpu import DataArray, date_range
        from xsdba_tpu.utils.grouper import Grouper

        rng = np.random.default_rng(4)
        T = 365 * 2
        t = date_range("2000-01-01", periods=T, freq="D", calendar="noleap")
        x = rng.normal(0, 1, T)
        da = DataArray(x, ("time",), {"time": t}, {}, "tas")
        # identity transform through a 31-day dayofyear window must return
        # each timestep's own (window-center) value
        out = Grouper("time.dayofyear", window=31).apply(lambda v: v, da)
        np.testing.assert_allclose(np.asarray(out.data), x, rtol=0, atol=0)


def test_get_index():
    """Reference base.py:274-345: group label per timestep; interp gives the
    fractional month index."""
    from xsdba_tpu import date_range
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2001-01-01", periods=365, freq="D", calendar="noleap")
    gi = Grouper("time.month").get_index(t)
    assert gi.dims == ("time",) and gi.name == "month"
    assert int(np.asarray(gi.data)[0]) == 1 and int(np.asarray(gi.data)[-1]) == 12
    fi = Grouper("time.month").get_index(t, interp=True)
    v = np.asarray(fi.data)
    assert 0.5 <= v[0] < 0.6 and v[-1] > 12.4
    g1 = Grouper("time").get_index(t)
    assert (np.asarray(g1.data) == 1).all() and g1.name == "group"


class TestApplyChunked:
    """Public Grouper.apply must give identical results chunked vs one-shot
    (the memory-bounding treatment; windowed-doy gathers on big site batches
    would otherwise exceed the element budget)."""

    @staticmethod
    def _da(random, sites=5, years=4):
        n = 365 * years
        from xsdba_tpu import DataArray

        t = date_range("2001-01-01", periods=n, freq="D", calendar="noleap")
        x = random.normal(10, 3, (sites, n))
        return DataArray(x, ("site", "time"), {"time": t}, {"units": "K"}, "tas")

    def test_reduction_parity(self, random):
        import jax.numpy as jnp

        da = self._da(random)
        g = Grouper("time.dayofyear", window=31)
        full = g.apply("mean", da, group_chunk=10**9)
        chunked = g.apply("mean", da, group_chunk=37)
        np.testing.assert_array_equal(np.asarray(full.data), np.asarray(chunked.data))
        fn = lambda v: jnp.nanquantile(v, 0.9, axis=-1)
        full = g.apply(fn, da, group_chunk=10**9)
        chunked = g.apply(fn, da, group_chunk=41)
        np.testing.assert_array_equal(np.asarray(full.data), np.asarray(chunked.data))

    def test_transform_parity(self, random):
        import jax.numpy as jnp

        da = self._da(random)
        g = Grouper("time.dayofyear", window=5)

        def center(v):
            return v - jnp.nanmean(v, axis=-1, keepdims=True)

        full = g.apply(center, da, group_chunk=10**9)
        chunked = g.apply(center, da, group_chunk=23)
        assert full.dims == chunked.dims == da.dims
        np.testing.assert_array_equal(np.asarray(full.data), np.asarray(chunked.data))

    def test_auto_chunk_under_budget(self, random, monkeypatch):
        """Force a tiny budget so auto-chunking must engage, and check parity."""
        from xsdba_tpu.utils import grouper as grouper_mod

        da = self._da(random)
        g = Grouper("time.month")
        full = g.apply("std", da)
        monkeypatch.setattr(grouper_mod, "_APPLY_CHUNK_BUDGET", 4096)
        chunked = g.apply("std", da)
        np.testing.assert_array_equal(np.asarray(full.data), np.asarray(chunked.data))

    def test_callable_never_auto_chunked(self, random, monkeypatch):
        """A callable that couples groups must see the FULL gather even when
        the memory budget would force chunking for the named reductions —
        chunking would silently change its meaning."""
        import jax.numpy as jnp

        from xsdba_tpu.utils import grouper as grouper_mod

        da = self._da(random)
        g = Grouper("time.month")

        def coupled(v):  # normalize each group's mean by the cross-group max
            m = jnp.nanmean(v, axis=-1)
            return m / jnp.max(m, axis=-1, keepdims=True)

        want = np.asarray(g.apply(coupled, da).data)
        monkeypatch.setattr(grouper_mod, "_APPLY_CHUNK_BUDGET", 64)
        got = np.asarray(g.apply(coupled, da).data)
        np.testing.assert_array_equal(got, want)
        # explicit opt-in still chunks (and for this func changes results)
        opt = np.asarray(g.apply(coupled, da, group_chunk=4).data)
        assert not np.allclose(opt, want)
