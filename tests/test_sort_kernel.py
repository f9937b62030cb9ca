"""Full-row key+payload bitonic sort (ops/pallas/sort_kernel.py).

Values must equal ``np.sort`` exactly; the multiset of (value, payload)
pairs must be preserved (tie order may differ from lax.sort — the
selection backend consumes the multiset only).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xsdba_tpu.ops.pallas.sort_kernel import sort_rows_with_payload


@pytest.mark.parametrize("mode", ["xla", "interpret"])
@pytest.mark.parametrize(
    "shape",
    [
        (3, 1000),
        (2, 8192),
        pytest.param((2, 54750), marks=pytest.mark.slow),  # ~80 s in interpret
    ],
)
def test_sorted_values_and_pair_multiset(mode, shape):
    B, T = shape
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T)).astype(np.float32)
    x[:, ::7] = 1.5  # ties
    lab = rng.integers(0, 373760, (B, T)).astype(np.int32)
    kw = dict(use_kernel=False) if mode == "xla" else dict(interpret=True, use_kernel=True)
    k, l = sort_rows_with_payload(jnp.asarray(x), jnp.asarray(lab), **kw)
    k, l = np.asarray(k), np.asarray(l)
    np.testing.assert_array_equal(k[:, :T], np.sort(x, axis=1))
    assert np.all(np.isinf(k[:, T:]))  # padding
    for b in range(B):
        a1 = sorted(zip(x[b].tolist(), lab[b].tolist()))
        a2 = sorted(zip(k[b, :T].tolist(), l[b, :T].tolist()))
        assert a1 == a2


def test_inf_keys_sort_last():
    x = np.array([[2.0, np.inf, -np.inf, 1.0]], np.float32)
    lab = np.array([[1, 2, 3, 4]], np.int32)
    k, l = sort_rows_with_payload(jnp.asarray(x), jnp.asarray(lab), use_kernel=False)
    np.testing.assert_array_equal(np.asarray(k)[0, :4], np.sort(x[0]))
    assert np.asarray(l)[0, 0] == 3 and np.asarray(l)[0, 2] == 1
