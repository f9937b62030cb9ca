"""Golden-vector pins for the hard semantic corners (SURVEY §4).

Expected outputs in tests/golden/golden.npz were derived independently of the
library (np.nanquantile, scipy.interp1d/griddata mirroring reference
utils.py:317-513, a numpy re-derivation of _processing.py:74-135) by
scripts/gen_golden.py and frozen.  Any future semantic drift in these
functions fails here.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


@pytest.fixture(scope="module")
def pack():
    return np.load(GOLDEN)


class TestGolden:
    def test_type7_nan_quantile(self, pack):
        from xsdba_tpu.ops.quantile import nan_quantile

        got = np.asarray(nan_quantile(pack["q7_x"], pack["q7_q"], axis=-1))
        np.testing.assert_allclose(got, pack["q7_want"], rtol=1e-12, atol=1e-12, equal_nan=True)

    @pytest.mark.parametrize("method", ["linear", "nearest"])
    @pytest.mark.parametrize("extrap", ["constant", "nan"])
    def test_interp1d_nan_edges(self, pack, method, extrap):
        from xsdba_tpu.ops.interp import interp1d_table

        got = np.asarray(interp1d_table(pack["i1_newx"], pack["i1_xq"], pack["i1_yq"], method=method, extrap=extrap))
        np.testing.assert_allclose(got, pack[f"i1_want_{method}_{extrap}"], rtol=1e-12, atol=1e-12, equal_nan=True)

    def test_grouped_interp_matches_griddata_isolines(self, pack):
        """On segments between vertically-adjacent table nodes the separable
        blend must equal the reference's scipy.griddata (verified identical
        at generation time)."""
        from xsdba_tpu.ops.interp import interp_on_quantiles_grouped

        got = np.asarray(
            interp_on_quantiles_grouped(
                pack["g2_newx"], pack["g2_frac"], pack["g2_xq"], pack["g2_yq"], pack["g2_pos"],
                method="linear", extrap="constant",
            )
        )
        np.testing.assert_allclose(got, pack["g2_want"], rtol=1e-10, atol=1e-12)

    def test_month_frac_index_matches_datetime_derivation(self, pack):
        """Grouper month fractional index vs an independent datetime
        derivation (reference base.py:293-310)."""
        from xsdba_tpu.utils.calendar import date_range
        from xsdba_tpu.utils.grouper import Grouper

        t = date_range("2001-01-01", periods=365, freq="D", calendar="standard")
        gi = Grouper("time.month").indexes(t)
        np.testing.assert_allclose(gi.frac_idx, pack["g2_frac"], rtol=0, atol=1e-14)

    def test_adapt_freq_ties_invariants(self, pack):
        """Deterministic invariants of adapt_freq under tie-broken random
        ranks: P0s, dP0, pth exact; adapted count exact; adapted values land
        in [thresh, pth]; preserved values pass through untouched."""
        import jax

        from xsdba_tpu.processing import _adapt_freq_grouped

        refg = np.asarray(pack["af_ref"])[None, :]
        simg = np.asarray(pack["af_sim"])[None, :]
        thresh = float(pack["af_thresh"])
        sim_ad, P0_ref, P0_hist, pth, dP0 = _adapt_freq_grouped(
            refg, simg, thresh, key=jax.random.PRNGKey(7)
        )
        np.testing.assert_allclose(float(P0_ref[0]), pack["af_P0_ref"], rtol=1e-14)
        np.testing.assert_allclose(float(P0_hist[0]), pack["af_P0_hist"], rtol=1e-14)
        np.testing.assert_allclose(float(dP0[0]), pack["af_dP0"], rtol=1e-12)
        np.testing.assert_allclose(float(pth[0]), pack["af_pth"], rtol=1e-12)

        sim_ad = np.asarray(sim_ad)[0]
        sim = simg[0]
        changed = sim_ad != sim
        assert changed.sum() == int(pack["af_n_adapted"])
        assert (sim_ad[changed] >= thresh).all()
        assert (sim_ad[changed] <= float(pack["af_pth"])).all()
        # only originally-dry (tied) values can be adapted here: all adapted
        # ranks fall below P0_sim, and every sim value above thresh has a
        # higher rank than every dry value
        assert (sim[changed] <= thresh).all()

    @pytest.mark.parametrize("tgt", [360, 366])
    def test_doy_calendar_interp(self, pack, tgt):
        from xsdba_tpu.utils.calendar import interpolate_doy_calendar

        got = interpolate_doy_calendar(pack["doy_src365"], tgt)
        np.testing.assert_allclose(got, pack[f"doy_want_{tgt}"], rtol=1e-12, atol=1e-14)
