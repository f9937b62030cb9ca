"""Shared end-to-end fixture cases for all 11 adjustment classes.

One deterministic tiny scenario per class; ``scripts/gen_e2e_fixtures.py``
freezes each case's scen output into ``tests/golden/e2e_scen.npz`` and
``tests/test_e2e_frozen.py`` replays the cases against the frozen values at
1e-12 — the whole-pipeline drift alarm complementing the kernel golden pack
(reference analogue: frozen-value regressions,
``/root/reference/tests/test_adjustment.py:434-452``).

Determinism: numpy inputs from a fixed PCG64 seed (bit-stable per NEP 19);
JAX-PRNG-consuming classes (rotation matrices, OT draws, tie-break noise)
re-seed the session Threefry stream per case.
"""

from __future__ import annotations

import numpy as np
from scipy import stats

import xsdba_tpu as xt
from xsdba_tpu.models import (
    LOCI,
    OTC,
    DetrendedQuantileMapping,
    EmpiricalQuantileMapping,
    ExtremeValues,
    MBCn,
    NpdfTransform,
    PrincipalComponents,
    QuantileDeltaMapping,
    Scaling,
    dOTC,
)
from xsdba_tpu.processing import stack_variables
from xsdba_tpu.utils.rng import seed

N_DAYS = 365 * 3
JAX_SEED = 20260817


def build_inputs():
    rng = np.random.default_rng(42_2026)
    t = xt.date_range("1991-01-01", periods=N_DAYS, freq="D", calendar="noleap")
    t2 = xt.date_range("2051-01-01", periods=N_DAYS, freq="D", calendar="noleap")
    u = rng.random((2, N_DAYS))
    u2 = rng.random((2, N_DAYS))

    def mk(v, units, time):
        return xt.DataArray(np.asarray(v, float), ("site", "time"), {"time": time}, {"units": units}, "pr")

    season = 1.0 + 0.4 * np.sin(2 * np.pi * np.arange(N_DAYS) / 365.0)
    ref = mk(stats.gamma.ppf(u, 4, scale=2) * season + 0.1, "mm/d", t)
    hist = mk(stats.gamma.ppf(u, 6, scale=1.5) * season + 0.1, "mm/d", t)
    sim = mk(stats.gamma.ppf(u2, 7, scale=1.6) * season + 0.1, "mm/d", t2)

    def bi(mean, time):
        return stack_variables(
            xt.Dataset(
                {
                    "tas": xt.DataArray(rng.normal(mean, 1, N_DAYS), ("time",), {"time": time}, {"units": "K"}, "tas"),
                    "pr": xt.DataArray(rng.gamma(2, 2, N_DAYS), ("time",), {"time": time}, {"units": "mm/d"}, "pr"),
                }
            )
        )

    return {
        "ref": ref,
        "hist": hist,
        "sim": sim,
        "mv_ref": bi(0.0, t),
        "mv_hist": bi(1.0, t),
        "mv_sim": bi(1.5, t2),
    }


def _eqm(d):
    return EmpiricalQuantileMapping.train(
        d["ref"], d["hist"], kind="*", group="time.month", nquantiles=20
    ).adjust(d["sim"], interp="linear")


def _dqm(d):
    return DetrendedQuantileMapping.train(d["ref"], d["hist"], kind="*", nquantiles=15).adjust(
        d["sim"], detrend=1
    )


def _qdm(d):
    return QuantileDeltaMapping.train(d["ref"], d["hist"], kind="*", group="time.month", nquantiles=15).adjust(
        d["sim"]
    )


def _scaling(d):
    return Scaling.train(d["ref"], d["hist"], kind="*", group="time.month").adjust(d["sim"])


def _loci(d):
    return LOCI.train(d["ref"], d["hist"], thresh="1 mm/d").adjust(d["sim"])


def _extremes(d):
    scen0 = EmpiricalQuantileMapping.train(d["ref"], d["hist"], kind="*", nquantiles=15).adjust(d["sim"])
    ev = ExtremeValues.train(d["ref"], d["hist"], cluster_thresh="1 mm/d", q_thresh=0.9)
    return ev.adjust(d["sim"], scen0, frac=0.5, power=2)


def _pca(d):
    return PrincipalComponents.train(d["mv_ref"], d["mv_hist"], crd_dim="multivar").adjust(d["mv_hist"])


def _npdf(d):
    return NpdfTransform.adjust(d["mv_ref"], d["mv_hist"], n_iter=3, n_escore=-1)


def _mbcn(d):
    mbcn = MBCn.train(d["mv_ref"], d["mv_hist"], base_kws={"nquantiles": 10}, n_iter=2, n_escore=-1)
    return mbcn.adjust(d["mv_sim"], d["mv_ref"], d["mv_hist"])


def _otc(d):
    return OTC.adjust(d["mv_ref"], d["mv_hist"], bin_width=0.5)


def _dotc(d):
    return dOTC.adjust(d["mv_ref"], d["mv_hist"], d["mv_sim"], bin_width=0.5)


CASES = {
    "EmpiricalQuantileMapping": _eqm,
    "DetrendedQuantileMapping": _dqm,
    "QuantileDeltaMapping": _qdm,
    "Scaling": _scaling,
    "LOCI": _loci,
    "ExtremeValues": _extremes,
    "PrincipalComponents": _pca,
    "NpdfTransform": _npdf,
    "MBCn": _mbcn,
    "OTC": _otc,
    "dOTC": _dotc,
}


def run_case(name: str, inputs=None) -> np.ndarray:
    seed(JAX_SEED)
    scen = CASES[name](inputs if inputs is not None else build_inputs())
    return np.asarray(scen.data, dtype=np.float64)
