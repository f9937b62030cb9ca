import numpy as np
import pytest

import xsdba_tpu as xt
from xsdba_tpu.utils.units import (
    convert_units_to,
    harmonize_units,
    parse_units,
    pint_multiply,
    str2quantity,
    units2str,
)


def test_parse_basic():
    for s in ("K", "degC", "mm", "mm/d", "mm d-1", "kg m-2 s-1", "%", "", "1"):
        u = parse_units(s)
        assert units2str(u) == s


def test_quantity_strings():
    q = str2quantity("1 mm d-1")
    assert q.magnitude == 1
    assert q.to("mm/d").magnitude == pytest.approx(1)
    assert str2quantity("2.5e-1 m").to("cm").magnitude == pytest.approx(25)


def test_temperature_offsets():
    assert str2quantity("0 degC").to("K").magnitude == pytest.approx(273.15)
    assert str2quantity("300 K").to("degC").magnitude == pytest.approx(26.85)
    assert str2quantity("32 degF").to("degC").magnitude == pytest.approx(0, abs=1e-9)


def test_precipitation_equivalences():
    # 1 kg m-2 s-1 of water == 1 mm/s == 86400 mm/d
    assert str2quantity("1 kg m-2 s-1").to("mm/d").magnitude == pytest.approx(86400)
    assert str2quantity("86400 mm/d").to("kg m-2 s-1").magnitude == pytest.approx(1)
    assert str2quantity("1 mm/d").to("m/d").magnitude == pytest.approx(0.001)
    # reference test uses 0.007 m/week thresholds (tests/test_adjustment.py:1308)
    assert str2quantity("0.007 m/week").to("mm/d").magnitude == pytest.approx(1.0)


def test_incompatible_raises():
    with pytest.raises(ValueError, match="convert"):
        str2quantity("1 K").to("mm")


def test_convert_dataarray():
    t = xt.date_range("2000-01-01", periods=3, freq="D")
    da = xt.DataArray(np.array([0.0, 10.0, 20.0]), ("time",), {"time": t}, {"units": "degC"}, "tas")
    out = convert_units_to(da, "K")
    np.testing.assert_allclose(np.asarray(out.data), [273.15, 283.15, 293.15])
    assert out.attrs["units"] == "K"


def test_harmonize():
    t = xt.date_range("2000-01-01", periods=2, freq="D")
    a = xt.DataArray(np.array([280.0, 285.0]), ("time",), {"time": t}, {"units": "K"}, "a")
    b = xt.DataArray(np.array([5.0, 10.0]), ("time",), {"time": t}, {"units": "degC"}, "b")
    (a2, b2), units = harmonize_units(a, b)
    assert units == "K"
    np.testing.assert_allclose(np.asarray(b2.data), [278.15, 283.15])


def test_pint_multiply():
    t = xt.date_range("2000-01-01", periods=2, freq="D")
    pr = xt.DataArray(np.array([1.0, 2.0]), ("time",), {"time": t}, {"units": "kg m-2 s-1"}, "pr")
    out = pint_multiply(pr, "1 d", out_units="mm")
    np.testing.assert_allclose(np.asarray(out.data), [86400.0, 172800.0])
    assert out.attrs["units"] == "mm"


def test_time_units():
    assert parse_units("degC/year").dims[2] == -1
    assert str2quantity("1 K/year").to("K/d").magnitude == pytest.approx(1 / 365.2425)


def test_units_registry_facade():
    """``xsdba_tpu.units.units`` mirrors the reference's module-level pint
    application registry surface (reference units.py:34): callable parse,
    parse_units/parse_expression, and the pint Quantity constructor forms."""
    from xsdba_tpu.units import units
    from xsdba_tpu.utils.units import Quantity, Unit

    q = units("1 mm/d")
    assert isinstance(q, Quantity) and q.magnitude == 1.0
    assert isinstance(units.parse_units("mm/d"), Unit)
    assert units.parse_expression("2 K").magnitude == 2.0
    assert units.Quantity is Quantity and units.Unit is Unit
    # pint constructor forms
    assert units.Quantity("3 degC").units.raw == "degC"
    assert units.Quantity(3, "degC").magnitude == 3
    assert units.Quantity(3).units.dims == (0, 0, 0, 0)
    assert units.Quantity(5, units="K").to("degC").magnitude == pytest.approx(-268.15)


def test_stacked_adjust_converts_sim_to_train_units(random):
    """train on stacked K data, adjust a degC sim: the per-variable training
    units (stored as train_units) must drive the conversion — the K-space
    factors applied to raw degC magnitudes would be silently wrong."""
    import xsdba_tpu as xt
    from xsdba_tpu.processing import stack_variables

    t = xt.date_range("2001-01-01", periods=365, freq="D", calendar="noleap")

    def mkds(tas_vals, units):
        return xt.Dataset(
            {
                "tasmax": xt.DataArray(np.asarray(tas_vals), ("time",), {"time": t}, {"units": units}, "tasmax"),
                "pr": xt.DataArray(np.abs(random.normal(2, 1, len(t))), ("time",), {"time": t}, {"units": "mm/d"}, "pr"),
            }
        )

    ref = stack_variables(mkds(random.normal(285, 3, len(t)), "K"))
    hist = stack_variables(mkds(random.normal(287, 3, len(t)), "K"))
    eqm = xt.EmpiricalQuantileMapping.train(ref, hist, group="time", nquantiles=20)
    simC = stack_variables(mkds(random.normal(14, 3, len(t)), "degC"))
    scen = eqm.adjust(simC, interp="linear")
    names = list(np.asarray(scen.coords["multivar"]))
    tasrow = np.asarray(scen.data)[names.index("tasmax")]
    assert 270 < float(np.nanmean(tasrow)) < 300  # Kelvin scale, not ~12 degC
    assert scen.attrs["_variable_attrs"]["tasmax"]["units"] == "K"
