"""Reference public-API parity guard.

Statically enumerates every public top-level name in the reference's modules
(/root/reference/src/xsdba/*.py) and asserts each is reachable somewhere in
xsdba_tpu — the line-by-line inventory check, automated.  Plus functional
checks of the compat surface (map_groups/map_blocks, DataArray reductions,
nbutils forms, the OPTIONS view).
"""

import ast
import importlib
import pathlib
import pkgutil

import numpy as np
import pytest

import xsdba_tpu
from xsdba_tpu import Grouper
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.container import DataArray

REF = pathlib.Path("/root/reference/src/xsdba")

# dask/numba/xclim implementation details with no user-facing contract here:
# nothing — the sweep currently passes with an empty allowlist; add names
# only with a documented reason.
ALLOWED_MISSING: dict[str, set] = {}


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_every_reference_public_name_is_covered():
    mods = [
        "adjustment", "base", "detrending", "processing", "units", "utils",
        "options", "formatting", "loess", "measures", "properties", "typing",
        "nbutils",
    ]
    have = set(dir(xsdba_tpu))
    for m in pkgutil.walk_packages(xsdba_tpu.__path__, "xsdba_tpu."):
        if "native" in m.name:
            continue
        have |= set(dir(importlib.import_module(m.name)))

    missing = {}
    for name in mods:
        tree = ast.parse((REF / f"{name}.py").read_text())
        pub = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and not n.name.startswith("_")
        ]
        for n in tree.body:
            if isinstance(n, ast.Assign):
                for tgt in n.targets:
                    if isinstance(tgt, ast.Name) and not tgt.id.startswith("_") and tgt.id != "logger":
                        pub.append(tgt.id)
        miss = [x for x in pub if x not in have and x not in ALLOWED_MISSING.get(name, set())]
        if miss:
            missing[name] = miss
    assert not missing, f"reference public names unreachable in xsdba_tpu: {missing}"


def _da():
    t = date_range("2000-01-01", periods=730, freq="D", calendar="noleap")
    data = np.random.default_rng(0).normal(10, 2, (3, 730))
    return DataArray(data, ("site", "time"), {"time": t}, {"units": "K"}, "tas"), t


def test_map_groups_eager_equivalent():
    from xsdba_tpu.base import map_groups

    da, t = _da()

    @map_groups(group_mean=["<PROP>"])
    def my_mean(block, *, dim):
        return block.mean(dim)

    out = my_mean(da, group=Grouper("time.month"))
    assert out.dims == ("site", "month") and out.shape == (3, 12)
    want = np.asarray(da.data)[:, np.asarray(t.month) == 1].mean(axis=1)
    np.testing.assert_allclose(np.asarray(out.data)[:, 0], want, rtol=1e-12)


def test_map_blocks_and_dask_stubs():
    from xsdba_tpu.base import duck_empty, ensure_chunk_size, map_blocks, uniform_calendars, uses_dask

    da, _ = _da()

    @map_blocks(reduces=["time"], out=["<PROP>"])
    def ident(ds, **kw):
        return ds

    assert ident(da) is da
    assert duck_empty(("a", "b"), {"a": 2, "b": 3}).shape == (2, 3)
    assert uses_dask(da) is False
    assert ensure_chunk_size(da, time=100) is da
    assert "noleap" in uniform_calendars


def test_dataarray_named_reductions():
    da, _ = _da()
    x = np.asarray(da.data)
    np.testing.assert_allclose(np.asarray(da.mean("time").data), np.nanmean(x, axis=1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(da.std("site").data), np.nanstd(x, axis=0), rtol=1e-12)
    np.testing.assert_allclose(float(da.sum().data), np.nansum(x), rtol=1e-12)
    assert da.max("time").dims == ("site",)


def test_nbutils_reference_forms():
    from xsdba_tpu.nbutils import quantile, remove_NaNs, vecquantiles

    da, _ = _da()
    x = np.random.default_rng(2).normal(size=(2, 50))
    x[0, 3] = np.nan
    assert remove_NaNs(x).shape == (2, 49)

    qq = quantile(da, [0.1, 0.5], "time")
    assert qq.dims == ("site", "quantiles")
    np.testing.assert_allclose(
        np.asarray(qq.data), np.nanquantile(np.asarray(da.data), [0.1, 0.5], axis=1).T, rtol=1e-12
    )
    rnk = DataArray(np.full(3, 0.5), ("site",), {}, {}, None)
    vq = vecquantiles(da, rnk, "time")
    np.testing.assert_allclose(
        np.asarray(vq.data), np.nanquantile(np.asarray(da.data), 0.5, axis=1), rtol=1e-12
    )
    # bare arrays need an integer axis — a string dim must raise, not
    # silently reduce axis -1
    with pytest.raises(TypeError, match="integer axis"):
        quantile(x, [0.5], "time")
    with pytest.raises(TypeError, match="integer axis"):
        vecquantiles(x, np.full(2, 0.5), "time")
    np.testing.assert_allclose(  # quantiles land on the trailing axis
        np.asarray(quantile(x, [0.5], 0)), np.nanquantile(x, [0.5], axis=0).T, rtol=1e-12
    )


def test_options_view_and_history_decorator():
    from xsdba_tpu.formatting import update_xsdba_history
    from xsdba_tpu.options import OPTIONS, set_options

    assert OPTIONS["extra_output"] is False
    with set_options(extra_output=True):
        assert OPTIONS["extra_output"] is True
    assert OPTIONS["extra_output"] is False

    da, _ = _da()

    @update_xsdba_history
    def fake_proc(d, thresh=1):
        return d.copy()

    out = fake_proc(da, thresh=2)
    assert "fake_proc(thresh=2)" in out.attrs["history"]

    # DataArrays passed by keyword: history merges, call string names them
    da2, _ = _da()
    da2.attrs["history"] = "upstream-provenance"

    @update_xsdba_history
    def fake_merge(*, ref, thresh=1):
        return ref.copy()

    out2 = fake_merge(ref=da2, thresh=3)
    assert "upstream-provenance" in out2.attrs["history"]
    assert "ref=" in out2.attrs["history"] and "thresh=3" in out2.attrs["history"]


def test_estimate_delta_from_cf_and_default_delta():
    from xsdba_tpu.processing import estimate_delta_from_cf, spectral_filter

    f2 = DataArray(
        np.random.default_rng(1).normal(size=(16, 16)),
        ("lat", "lon"),
        {"lat": np.linspace(-40, 40, 16), "lon": np.linspace(0, 75, 16)},
        {"units": "K"},
        "tas",
    )
    d = estimate_delta_from_cf(f2)
    assert d.endswith("km") and abs(float(d.split()[0]) - (80 / 15) * 111.2) < 1e-6
    out = spectral_filter(f2, ["lat", "lon"], lam_long="2000 km", lam_short="500 km")
    assert out.shape == (16, 16)
    with pytest.raises(ValueError):
        estimate_delta_from_cf(DataArray(np.zeros(3), ("x",), {}, {}, None))
    # duplicated station latitudes: the median positive spacing, not the
    # (zero) first gap of the sorted values
    f3 = DataArray(
        np.zeros((4, 5)), ("lat", "time"),
        {"lat": np.array([10.0, 10.0, 12.0, 14.0])}, {"units": "K"}, "tas",
    )
    assert abs(float(estimate_delta_from_cf(f3).split()[0]) - 2 * 111.2) < 1e-9
    # all-equal latitudes cannot yield a spacing
    f4 = DataArray(np.zeros((3, 5)), ("lat", "time"), {"lat": np.full(3, 5.0)}, {"units": "K"}, "tas")
    with pytest.raises(ValueError, match="no distinct"):
        estimate_delta_from_cf(f4)
    # a bare "y" coordinate without units must not be read as degrees
    # (projected grids are in meters)
    f5 = DataArray(np.zeros((4, 5)), ("y", "time"), {"y": np.arange(4) * 25000.0}, {"units": "K"}, "tas")
    with pytest.raises(ValueError, match="units"):
        estimate_delta_from_cf(f5)
