"""Pallas kernel parity tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

from xsdba_tpu.ops.interp import _compact_nan_pairs, _interp_unrolled
from xsdba_tpu.ops.pallas import interp_table_pallas, pallas_available


@pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")
def test_interp_kernel_matches_xla(random):
    import jax.numpy as jnp

    R, L, nq = 6, 300, 20
    xs = np.sort(random.normal(size=(R, nq)), axis=-1)
    ys = random.normal(size=(R, nq))
    # a couple of NaN pairs
    xs[0, 3] = np.nan
    ys[1, 7] = np.nan
    v = random.normal(size=(R, L)) * 2
    v[2, 10] = np.nan

    xsc, ysc, nv = _compact_nan_pairs(jnp.asarray(xs), jnp.asarray(ys))
    want = np.asarray(_interp_unrolled(jnp.asarray(v), xsc, ysc, nv, "linear", "constant"))
    got = np.asarray(interp_table_pallas(jnp.asarray(v), xsc, ysc, nv, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_interp_kernel_3d_matches_xla(random):
    """Partition-layout Pallas interp (the wired adjust-path kernel) must be
    exactly the XLA unrolled path."""
    import jax.numpy as jnp

    from xsdba_tpu.ops.interp import _compact_nan_pairs, _interp_unrolled
    from xsdba_tpu.ops.pallas.interp_kernel import interp_table_pallas_3d

    B, Gp, Lp, nq = 4, 16, 96, 13
    xs = np.sort(random.normal(0, 2, (B, Gp, nq)), axis=-1)
    ys = random.normal(0, 1, (B, Gp, nq))
    # poke NaN pairs into some tables
    xs[0, 3, 5] = np.nan
    ys[1, 2, 7] = np.nan
    v = random.normal(0, 3, (B, Gp, Lp))
    v[2, 5, 10] = np.nan

    xsc, ysc, nv = _compact_nan_pairs(jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))
    vj = jnp.asarray(v, jnp.float32)
    want = np.asarray(_interp_unrolled(vj, xsc, ysc, nv, "linear", "constant"))
    got = np.asarray(interp_table_pallas_3d(vj, xsc, ysc, nv, interpret=True))
    # fp-identical up to FMA fusion differences (1-2 ulp f32)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6, equal_nan=True)
