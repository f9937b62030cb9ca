"""Runtime engine options (``set_options`` / env vars) — VERDICT r4 #4.

Every windowed-quantile engine choice must be flippable at runtime through
``set_options`` with no source edit, and both settings of each flip must
agree on the same inputs (bit-identical where the engines share extraction
arithmetic, ulp-level across the static-gamma FMA boundary — see the
precision note on ``windowed_group_quantile``).  Reference options pattern:
``/root/reference/src/xsdba/options.py:28-83``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xsdba_tpu import set_options
from xsdba_tpu.options import OPTIONS
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.ops.quantile import windowed_group_quantile
from xsdba_tpu.ops.selquant import selection_ok, selection_windowed_quantile
from xsdba_tpu.utils.calendar import date_range
from xsdba_tpu.utils.grouper import Grouper


def _problem(years=6, n_sites=4, window=31, seed=11):
    t = date_range("1980-01-01", periods=365 * years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=window).indexes(t)
    rng = np.random.default_rng(seed)
    x = rng.normal(10, 3, (n_sites, len(t))).astype(np.float32)
    x[0, ::17] = np.nan  # partial-NaN row exercises the dynamic/NaN paths
    q = equally_spaced_nodes(20).astype(np.float32)
    return gi, x, q


def test_selection_backend_option_flip():
    """selection_backend=False must route to the merge path; both engines
    agree to ulp on identical inputs, flipped purely through the option."""
    gi, x, q = _problem()
    plan = gi.merge_plan
    with set_options(selection_backend=True):
        assert selection_ok(plan, q)  # CPU test env: selection is the default
        a = np.asarray(windowed_group_quantile(x, plan, q))
    with set_options(selection_backend=False):
        assert not selection_ok(plan, q)
        b = np.asarray(windowed_group_quantile(x, plan, q))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6, equal_nan=True)


def test_selection_mode_option_bit_identical():
    """emit and gather extraction engines are bit-identical; the ``auto``
    default resolves to one of them."""
    gi, x, q = _problem(window=5)
    plan = gi.merge_plan
    xj = jnp.asarray(x)
    with set_options(selection_mode="emit"):
        a = np.asarray(selection_windowed_quantile(xj, plan, q))
    with set_options(selection_mode="gather"):
        b = np.asarray(selection_windowed_quantile(xj, plan, q))
    with set_options(selection_mode="auto"):
        c = np.asarray(selection_windowed_quantile(xj, plan, q))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_selection_sort_option_bit_identical():
    """lax.sort vs the bitonic network stage-1 (``xla`` = the CPU-testable
    lowering of the TPU ``pallas`` default), flipped through the option,
    must be bit-identical — including a partial-NaN row."""
    gi, x, q = _problem(window=5)
    plan = gi.merge_plan
    xj = jnp.asarray(x)
    with set_options(selection_sort="lax"):
        a = np.asarray(selection_windowed_quantile(xj, plan, q))
    with set_options(selection_sort="xla"):
        b = np.asarray(selection_windowed_quantile(xj, plan, q))
    np.testing.assert_array_equal(a, b)


def test_extract_mode_option_bit_identical():
    """strip / flat / matmul static extraction engines, flipped through the
    option, must be bit-identical; ``auto`` honors ``extract_flat``."""
    gi, x, q = _problem(window=5, seed=23)
    x = np.where(np.isnan(x), 1.0, x).astype(np.float32)  # static path: finite
    plan = gi.merge_plan
    outs = {}
    with set_options(selection_backend=False):
        for mode in ("strip", "flat", "matmul"):
            with set_options(extract_mode=mode):
                outs[mode] = np.asarray(windowed_group_quantile(x, plan, q))
        with set_options(extract_flat=True):
            outs["compat"] = np.asarray(windowed_group_quantile(x, plan, q))
    for k in ("flat", "matmul", "compat"):
        np.testing.assert_array_equal(outs[k], outs["strip"], err_msg=k)


def test_fuse_fold_classes_option_bit_identical():
    """Fused all-classes fold vs per-class launches (interpret mode off-TPU),
    flipped through the option, must be bit-identical."""
    gi, x, q = _problem(window=31)
    plan = gi.merge_plan
    with set_options(selection_backend=False, fuse_fold_classes=True):
        a = np.asarray(
            windowed_group_quantile(x, plan, q, use_kernel=True, interpret=True)
        )
    with set_options(selection_backend=False, fuse_fold_classes=False):
        b = np.asarray(
            windowed_group_quantile(x, plan, q, use_kernel=True, interpret=True)
        )
    np.testing.assert_array_equal(a, b)


def test_option_validation_and_view():
    with pytest.raises(ValueError, match="Invalid value"):
        set_options(selection_mode="bogus")
    with pytest.raises(ValueError, match="Unknown options"):
        set_options(selection_banckend=True)
    assert "selection_backend" in OPTIONS
    with set_options(selection_backend=False):
        assert OPTIONS["selection_backend"] is False
    assert OPTIONS["selection_backend"] is True


def test_env_var_default(monkeypatch):
    """Process defaults come from XSDBA_* env vars (no source edit needed).

    Tests the env parsing directly (a module reload would fork the option
    stack out from under modules that bound it at import)."""
    from xsdba_tpu.utils.options import _env_bool

    assert _env_bool("XSDBA_NOT_SET_ANYWHERE", True) is True
    assert _env_bool("XSDBA_NOT_SET_ANYWHERE", False) is False
    for raw, want in [("0", False), ("false", False), ("off", False),
                      ("1", True), ("true", True), ("ON", True)]:
        monkeypatch.setenv("XSDBA_SELECTION_BACKEND_TESTVAR", raw)
        assert _env_bool("XSDBA_SELECTION_BACKEND_TESTVAR", True) is want, raw
