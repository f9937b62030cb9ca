"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

Mirrors the reference's dask-parity strategy (SURVEY §4): sharded-vs-single
parity replaces chunked-vs-numpy parity; float64 on CPU gives reference-grade
numerics for parity checks while the library stays dtype-generic for TPU f32.
"""

import os

# NOTE: the CI environment pre-imports jax (sitecustomize) with
# JAX_PLATFORMS=axon, so env vars alone are too late — use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-bound on CPU (hundreds of
# small jits); caching executables across runs cuts iteration wall time ~2.5x.
# Repo-local and gitignored; delete the directory to force cold compiles.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def random():
    return np.random.default_rng(42)


@pytest.fixture
def timeseries():
    """Factory for synthetic daily series (analogue of reference
    testing/helpers.py:48-113)."""
    from xsdba_tpu.utils.calendar import date_range

    def _make(values, start="2000-01-01", freq="D", calendar="standard", units=None, name="tas"):
        from xsdba_tpu import DataArray

        values = np.asarray(values)
        time = date_range(start, periods=values.shape[-1], freq=freq, calendar=calendar)
        attrs = {"units": units} if units else {}
        return DataArray(values, dims=("time",) if values.ndim == 1 else tuple(f"d{i}" for i in range(values.ndim - 1)) + ("time",), coords={"time": time}, attrs=attrs, name=name)

    return _make
