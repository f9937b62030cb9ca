import numpy as np
import pytest

from xsdba_tpu.ops.quantile import grouped_nan_quantile, nan_quantile, vecquantiles


@pytest.mark.parametrize("nans", [False, True])
def test_nan_quantile_matches_numpy(random, nans):
    x = random.normal(size=(5, 300))
    if nans:
        x[x < -1.0] = np.nan
    q = np.linspace(0.01, 0.99, 50)
    got = np.asarray(nan_quantile(x, q))
    want = np.nanquantile(x, q, axis=-1).T
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_nan_quantile_edges(random):
    x = random.normal(size=(40,))
    q = np.array([0.0, 1.0, 0.5])
    got = np.asarray(nan_quantile(x, q))
    np.testing.assert_allclose(got, np.nanquantile(x, q), rtol=1e-12)


def test_nan_quantile_all_nan():
    x = np.full((3, 10), np.nan)
    got = np.asarray(nan_quantile(x, np.array([0.1, 0.9])))
    assert np.all(np.isnan(got))


def test_nan_quantile_single_value():
    x = np.array([[5.0] + [np.nan] * 9])
    got = np.asarray(nan_quantile(x, np.array([0.0, 0.5, 1.0])))
    np.testing.assert_allclose(got, 5.0)


def test_vecquantiles(random):
    x = random.normal(size=(7, 200))
    rnk = random.uniform(size=(7,))
    got = np.asarray(vecquantiles(x, rnk))
    want = np.array([np.quantile(x[i], rnk[i]) for i in range(7)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    rnk2 = rnk.copy()
    rnk2[2] = np.nan
    got2 = np.asarray(vecquantiles(x, rnk2))
    assert np.isnan(got2[2]) and np.isfinite(got2[0])


def test_grouped_nan_quantile_equals_per_group(random):
    x = random.normal(size=(2, 120))
    # 3 groups of 40 with a ragged pad row
    gi = np.full((3, 50), -1, dtype=np.int32)
    for g in range(3):
        gi[g, :40] = np.arange(g * 40, (g + 1) * 40)
    q = np.array([0.1, 0.5, 0.9])
    got = np.asarray(grouped_nan_quantile(x, gi, q))
    for g in range(3):
        want = np.quantile(x[:, g * 40 : (g + 1) * 40], q, axis=-1).T
        np.testing.assert_allclose(got[:, g], want, rtol=1e-12)


def test_grouped_quantile_chunked_matches_full(random):
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2001-01-01", periods=365 * 4, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=5).indexes(t)
    x = random.normal(size=(3, len(t)))
    q = np.linspace(0.1, 0.9, 9)
    full = np.asarray(grouped_nan_quantile(x, gi.gather_idx, q))
    chunked = np.asarray(grouped_nan_quantile(x, gi.gather_idx, q, group_chunk=17))
    np.testing.assert_allclose(full, chunked, rtol=1e-9)  # fusion-order fp noise


def test_quantile_on_sorted_inf_sentinel_oracle():
    """The +inf-sentinel layout (merge-kernel rows) matches np.quantile of
    the valid prefix."""
    import jax.numpy as jnp

    from xsdba_tpu.ops.quantile import _quantile_on_sorted

    rng = np.random.default_rng(5)
    B, G, n, nv = 4, 7, 512, 437
    m = np.full((B, G, n), np.inf, dtype=np.float64)
    m[..., :nv] = np.sort(rng.normal(0, 1, (B, G, nv)), axis=-1)
    q = np.linspace(0, 1, 31)
    uniform = jnp.full((B, G), nv, dtype=jnp.int32)
    got = np.asarray(_quantile_on_sorted(jnp.asarray(m), uniform, jnp.asarray(q), 1.0, 1.0, sentinel="inf"))
    want = np.quantile(m[2, 3, :nv], q)
    np.testing.assert_allclose(got[2, 3], want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("variant", ["plain", "nans", "ties", "infs"])
def test_rank_with_sorted_fused_parity(random, variant):
    """The one-sort fused rank+quantile helper (MBCn hist side) must be
    numerically identical to the separate rank and nan_quantile calls."""
    from xsdba_tpu.ops.quantile import _quantile_on_sorted
    from xsdba_tpu.ops.rank import rank_pct_rescaled, rank_pct_rescaled_with_sorted

    x = random.normal(size=(4, 7, 211))
    if variant == "nans":
        x[x < -0.8] = np.nan
        x[2, 3] = np.nan  # one all-NaN row
    elif variant == "ties":
        x = np.round(x, 1)  # heavy ties
    elif variant == "infs":
        x[x > 1.5] = np.inf
        x[x < -1.5] = -np.inf
        x[np.abs(x) < 0.05] = np.nan  # NaNs must sort behind the +infs
    q = np.linspace(0.0, 1.0, 21)

    rnk, s, v = rank_pct_rescaled_with_sorted(x, axis=-1)
    got_q = np.asarray(_quantile_on_sorted(s, v, np.asarray(q, x.dtype), 1.0, 1.0))

    want_rnk = np.asarray(rank_pct_rescaled(x, axis=-1))
    want_q = np.asarray(nan_quantile(x, q, axis=-1))
    np.testing.assert_array_equal(np.asarray(rnk), want_rnk)
    np.testing.assert_array_equal(got_q, want_q)
